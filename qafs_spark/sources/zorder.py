"""Z-order clustered writes: multi-column data skipping for Parquet scans.

Sorting a table by one column gives perfect min/max pruning on that column
and none on any other. Interleaving the bits of several columns' bucket
numbers (the Z-order / Morton curve) gives *partial* locality on every
participating column simultaneously: a selective filter on ANY of them
touches O(files^(1 - 1/k)) of the files instead of all of them. This is the
same technique Delta Lake's OPTIMIZE ZORDER BY and ClickHouse/Iceberg
clustering use — implemented here as plain Catalyst expressions + a
range-partitioned write, no engine extension needed.

Scale shape: one scan to collect per-column min/max (a single tiny
aggregate), one narrow projection computing the interleaved key (pure
shift/or codegen), one range shuffle on the key, sorted Parquet write.
Readers need no special support: Parquet footer min/max stats per file /
row group do the skipping automatically.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-free quantization of ``col`` into [0, 2^bits): linear between
    the column's min and max (one correctly-rounded double op per row)."""
    n = F.lit((1 << bits) - 1)
    span = (hi - lo).cast("double")
    frac = F.when(span > 0, (col.cast("double") - lo.cast("double")) / span).otherwise(
        F.lit(0.0)
    )
    return F.least(n, F.greatest(F.lit(0), F.floor(frac * n).cast("long")))


def zorder_key(cols: Sequence[Column], bounds: Sequence[tuple], bits: int = 8) -> Column:
    """Interleave ``bits`` bits of each column's bucket number, MSB first.

    ``bounds[i]`` is the (min_col, max_col) pair for cols[i] (typically
    literals from a prior aggregate). With k columns the key has k*bits
    bits — keep k*bits <= 63.
    """
    buckets = [_bucket(c, F.lit(lo), F.lit(hi), bits) for c, (lo, hi) in zip(cols, bounds)]
    z = F.lit(0).cast("long")
    for b in range(bits - 1, -1, -1):
        for bk in buckets:
            z = F.shiftleft(z, 1) + F.shiftright(bk, b).bitwiseAND(F.lit(1))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: List[str],
    bits: int = 8,
    num_files: int = 16,
) -> None:
    """Write ``df`` as Parquet clustered on the Z-order curve of ``cols``.

    Collects each column's min/max (one aggregate job — the only action),
    computes the interleaved key, range-partitions into ``num_files`` and
    sorts within each file so Parquet row-group stats are tight on every
    participating column.
    """
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    row = df.agg(*aggs).first()
    bounds = [(row[f"__lo_{c}"], row[f"__hi_{c}"]) for c in cols]
    z = zorder_key([F.col(c) for c in cols], bounds, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
