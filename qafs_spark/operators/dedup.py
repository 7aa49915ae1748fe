"""Last-write-wins dedup: for each timestamp keep the most recent write.

Reference semantics (src/qafs/backend/pandas.py:160-161): sort by
``created_time``, ``groupby(time).last()`` — upsert-over-append-only.

Spark-first design: a ``groupBy(time).agg(max_by(...))`` instead of a window.
``max_by`` runs with map-side partial aggregation (each input partition first
reduces locally), so the shuffle carries at most one row per (group, map
task) — at 100 TB this is the difference between shuffling the full table and
shuffling ~|distinct timestamps|. A window (`row_number over partitionBy
time`) would shuffle every row; we only use that formulation when value types
are not struct-packable.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def is_orderable(dt) -> bool:
    """True when Spark can sort/compare the type (everything but maps,
    including nested occurrences — struct/array ordering is elementwise)."""
    from pyspark.sql import types as T

    if isinstance(dt, T.MapType):
        return False
    if isinstance(dt, T.ArrayType):
        return is_orderable(dt.elementType)
    if isinstance(dt, T.StructType):
        return all(is_orderable(f.dataType) for f in dt.fields)
    return True


def value_tiebreak(df: DataFrame, col: str = "value") -> Optional[List[str]]:
    """Deterministic LWW tiebreak on the value itself, when the type allows.

    Rows tied on (time, created_time) with differing values otherwise get a
    nondeterministic winner. Ordering by the value column breaks the tie
    deterministically (greatest value wins) — used by both the feature read
    path and the LWW-collapsing compaction so a pre-collapse read and the
    physically collapsed survivor agree. Returns None for non-orderable
    (map-typed) values, where the tie stays arbitrary."""
    try:
        dt = df.schema[col].dataType
    except KeyError:
        return None
    return [col] if is_orderable(dt) else None


def last_write_wins(
    df: DataFrame,
    time_col: str = "time",
    order_col: str = "created_time",
    value_cols: Optional[Sequence[str]] = None,
    group_cols: Optional[Sequence[str]] = None,
    tiebreak_cols: Optional[Sequence[str]] = None,
    keep_order_col: bool = False,
) -> DataFrame:
    """Keep, per (group_cols, time), the row with the greatest order_col.

    ``tiebreak_cols`` (optional) make the result deterministic when several
    rows share the same ``order_col`` — they extend the ordering
    lexicographically.
    """
    group_cols = list(group_cols or [])
    if value_cols is None:
        value_cols = [
            c for c in df.columns if c not in set(group_cols) | {time_col, order_col}
        ]
    value_cols = list(value_cols)

    order_fields = [F.col(order_col)] + [F.col(c) for c in (tiebreak_cols or [])]
    ordering = order_fields[0] if len(order_fields) == 1 else F.struct(*order_fields)

    aggs: List = [
        F.max_by(F.struct(*[F.col(c) for c in value_cols]), ordering).alias("__lww")
    ]
    if keep_order_col:
        aggs.append(F.max(order_col).alias(order_col))

    out = df.groupBy(time_col, *group_cols).agg(*aggs)
    cols = (
        [F.col(time_col)]
        + [F.col(c) for c in group_cols]
        + [F.col("__lww")[c].alias(c) for c in value_cols]
    )
    if keep_order_col:
        cols.append(F.col(order_col))
    return out.select(*cols)
