"""Generic as-of (last-value-before) join — the temporal join Spark lacks.

``asof_join(left, right)``: for every left row, attach the most recent right
row (``right_time <= left_time``, inclusive) within the same ``by`` keys —
pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` / kdb ``aj`` semantics, left
join flavored (no match → nulls).

Physical strategy (the reason this scales): **union + keyed window**, not a
range join. Right rows carry their payload in a struct; left rows carry
null; one window per ``by`` key ordered by ``(time, side)`` forward-fills
the last seen payload onto probe rows:

* one shuffle by ``by`` keys (same hash exchange a groupBy would use) — no
  range-condition BroadcastNestedLoop/cartesian blowup, which is what a
  naive ``left.join(right, cond=(t_r <= t_l))`` + max-window would produce;
* per-key windows parallelize across the keyspace; a single hot key is the
  same skew any per-key operator has (salt upstream if one key dominates);
* ``tolerance`` bounds staleness post-match (match discarded when older
  than ``left_time - tolerance``), exactly pandas `merge_asof(tolerance)`.

The resample grid as-of (operators/resample.py) is the special case where
``left`` is a generated grid and ``by`` is empty; it bin-compresses instead
because an empty ``by`` would single-task the window here.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..offsets import parse_offset


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str = "time",
    right_time: str = "time",
    by: Optional[Sequence[str]] = None,
    right_cols: Optional[Sequence[str]] = None,
    tolerance: Optional[str] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join. ``right_cols`` (default: all non-key, non-time right
    columns) are appended to every left row as ``<col><suffix>``, plus
    ``<right_time><suffix>`` (the matched timestamp).

    Ties: multiple right rows sharing ``(by, right_time)`` must be
    deduplicated by the caller (e.g. last-write-wins) — as-of semantics are
    otherwise ambiguous (engines disagree on which duplicate wins).

    With an empty ``by`` the keyed window degenerates to a single task over
    the full union — loudly warned here; for grid resampling use
    ``resample_asof`` (bin compression), or pass a coarse monotone bucket
    as ``by`` and stitch boundaries yourself.
    """
    by = list(by or [])
    if not by:
        import warnings

        warnings.warn(
            "asof_join with empty `by` runs ONE task over the full union "
            "(unpartitioned window) — fine for small frames only. Use "
            "resample_asof for grid as-of, or provide `by` keys.",
            RuntimeWarning,
            stacklevel=2,
        )
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in set(by) | {right_time}
        ]
    payload = F.struct(
        F.col(right_time).alias("__t"), *[F.col(c) for c in right_cols]
    )

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias("__probe"),
        F.lit(None).cast(
            right.select(payload).schema[0].dataType.simpleString()
        ).alias("__payload"),
        F.col(left_time).alias("__time"),
    )
    # `by` keys must exist under the same names on both sides; they (and only
    # they) survive on the right rows so the window co-partitions both sides
    r_tag = right.select(
        *[
            F.col(c) if c in by else F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
        ],
        F.lit(0).alias("__probe"),
        payload.alias("__payload"),
        F.col(right_time).alias("__time"),
    )
    unioned = l_tag.unionByName(r_tag)

    # right rows sort before probes at equal time (__probe asc) → inclusive
    w = (
        Window.partitionBy(*by) if by else Window.partitionBy(F.lit(0))
    ).orderBy("__time", "__probe").rowsBetween(Window.unboundedPreceding, 0)
    filled = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    )

    out = filled.filter(F.col("__probe") == 1)
    matched_t = F.col("__match.__t")
    if tolerance is not None:
        delta = parse_offset(tolerance).step_expr()
        fresh = matched_t >= F.col("__time") - delta
        out = out.withColumn(
            "__match", F.when(fresh, F.col("__match")).otherwise(F.lit(None))
        )
    sel = [F.col(c) for c in left.columns]
    sel.append(F.col("__match.__t").alias(f"{right_time}{suffix}"))
    sel += [F.col(f"__match.{c}").alias(f"{c}{suffix}") for c in right_cols]
    return out.select(*sel)
