"""Bucketed-table layout for shuffle-free co-located joins.

At 100 TB the dominant cost of a fact-fact join (e.g. lineitem x orders on
orderkey, or repeated feature joins on entity id) is the shuffle of both
sides. Spark's table bucketing kills it: both tables are written
pre-hash-partitioned into the same number of buckets on the join key, so a
later equi-join on that key needs NO Exchange on either side — the
SortMergeJoin reads co-located buckets directly (`spark.sql.sources.
bucketing.enabled`, on by default; `bucketing.autoBucketedScan.enabled`
lets Catalyst drop the bucketed scan when it would not help).

This module is the thin layout contract: write once bucketed, join forever
shuffle-free. It uses the session catalog's managed-table path
(``saveAsTable`` — bucket metadata lives in the catalog, which is what the
join planner consults; plain ``parquet(path)`` cannot record buckets).

Trade-offs (documented so callers choose deliberately):
* bucket count is fixed at write time — pick ~(largest table size /
  target partition size) and share it across co-joined tables;
* writes pay one extra shuffle (by bucket key) to produce exactly
  n_buckets files per partition instead of one file per task;
* AQE cannot re-balance a skewed bucket — salt upstream if one key
  dominates.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Optional[Sequence[str]] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a managed bucketed parquet table.

    ``sort_cols`` (default: the bucket columns) pre-sorts each bucket file
    so the co-located join skips its Sort as well when keys match.
    """
    bucket_cols = list(bucket_cols)
    sort_cols = list(sort_cols or bucket_cols)
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back (bucket metadata rides via the catalog)."""
    return spark.table(table)
