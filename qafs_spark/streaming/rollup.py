"""Incrementally-maintained rollup table: streaming upsert of per-day
aggregates via foreachBatch + dynamic partition overwrite.

The batch engine answers "events per day" by rescanning; a 100 TB pipeline
maintains the rollup INCREMENTALLY: each micro-batch touches only the
partitions its events fall in — read those partitions' current aggregates,
merge the batch's deltas, rewrite just those partitions. Everything else on
disk is untouched (dynamic partition overwrite), so maintenance cost scales
with the batch, not the table.

Delivery note: foreachBatch is at-least-once — a replayed micro-batch would
double-merge. The checkpoint makes replays rare; for exactly-once, record
``batch_id`` per partition and skip already-applied batches (the standard
idempotent-sink recipe), or sink into a table format with MERGE (Delta/
Iceberg). The parquet variant here keeps the repo dependency-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .. import storage as fs_storage


def incremental_daily_rollup(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    time_col: str = "ts",
    value_col: str = "value",
    trigger_available_now: bool = True,
):
    """Maintain ``path`` as a day-partitioned parquet rollup
    (day, n_events, sum_cents) updated per micro-batch.

    Returns the StreamingQuery. Aggregates are kept in integer cents so the
    merge (old + delta) is exact regardless of how events split across
    batches.
    """

    def upsert(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        delta = (
            batch.groupBy(F.date_format(time_col, "yyyy-MM-dd").alias("day"))
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col(value_col) * 100).cast("long")).alias(
                    "sum_cents"
                ),
            )
        )
        days = [r.day for r in delta.select("day").distinct().collect()]
        if not days:
            return
        merged = delta
        if fs_storage.path_exists(spark, path):
            current = spark.read.parquet(path).filter(F.col("day").isin(days))
            merged = (
                current.unionByName(delta)
                .groupBy("day")
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_cents").alias("sum_cents"),
                )
            )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                merged.write.mode("overwrite")
                .partitionBy("day")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    writer = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
