"""Structured Streaming ingest + windowed aggregation.

The reference is batch-only (SURVEY §2.9); the closest analogues are its
append-mode writes + last-write-wins reads (eventual upsert) and the
``created_time`` watermark-like filter. This module is the streaming-native
completion of that design:

* ``read_event_stream`` — file-source stream over the same Parquet layouts
  the batch engine writes (swap in kafka/… by changing the reader only);
* ``save_stream`` — ``writeStream`` into the exact batch feature-dataset
  layout (partition derivation included), so streamed features are
  immediately readable by ``FeatureStore.load_features`` with identical
  last-write-wins semantics — the classic lambda-architecture collapse;
* tumbling / sliding / session window aggregations with watermarks for
  late data.

State at scale: all aggregations are keyed by (window, optional keys) —
state store size is bounded by watermark horizon × key cardinality, and the
shuffle is the same hash partitioning a batch groupBy would use.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.feature_dataset import partition_expr

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType = EVENT_SCHEMA,
    max_files_per_trigger: Optional[int] = None,
    glob: Optional[str] = None,
) -> DataFrame:
    """File-source stream. ``path`` must be a directory (Structured Streaming
    requirement); pass ``glob`` to select specific files within it."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(path)


def tumbling_agg(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    time_col: str = "ts",
    keys: Optional[List[str]] = None,
) -> DataFrame:
    """count/sum/avg per tumbling window (+ optional keys), late data
    admitted up to the watermark."""
    keys = keys or []
    w = events.withWatermark(time_col, watermark).groupBy(
        F.window(F.col(time_col), window), *keys
    )
    return w.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
        F.avg("value").alias("avg_value"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        "n_events",
        "sum_value",
        "avg_value",
    )


def sliding_agg(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "30 minutes",
    time_col: str = "ts",
    keys: Optional[List[str]] = None,
) -> DataFrame:
    keys = keys or []
    w = events.withWatermark(time_col, watermark).groupBy(
        F.window(F.col(time_col), window, slide), *keys
    )
    return w.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("value").alias("avg_value"),
    ).select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *keys,
        "n_events",
        "avg_value",
    )


def session_agg(
    events: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "30 minutes",
    time_col: str = "ts",
    keys: Optional[List[str]] = None,
) -> DataFrame:
    """Session windows (gap-based) per key — e.g. user sessionization."""
    keys = keys or ["user_id"]
    w = events.withWatermark(time_col, watermark).groupBy(
        F.session_window(F.col(time_col), gap), *keys
    )
    return w.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    ).select(
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        *keys,
        "n_events",
        "sum_value",
    )


def save_stream(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    scheme: str = "date",
    time_col: str = "time",
    trigger_available_now: bool = True,
):
    """writeStream into the batch feature-dataset layout (append +
    partitionBy) — streamed rows obey the same last-write-wins read path."""
    out = stream.withColumn("partition", partition_expr(scheme, time_col))
    writer = (
        out.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("partition")
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    gap: str = "2 hours",
    watermark: str = "1 hour",
    key: str = "user_id",
    time_col: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join: each RIGHT row (e.g. purchase) matches
    LEFT rows (e.g. clicks) with the same ``key`` whose event time falls in
    ``[right.ts, right.ts + gap)`` — the streaming twin of
    ``operators.interval.interval_join`` (batch query
    ``interval_join_clicks``).

    Both sides carry event-time watermarks, and the join condition bounds
    the time skew, so Spark derives a state-eviction horizon for each side:
    state size is O(key cardinality x (gap + watermark)) rows, never the
    full stream. Output is append-mode pairs; aggregate downstream (or in
    a foreachBatch) as needed.

    Equi-key + time-range is exactly the shape Structured Streaming's
    symmetric hash join handles; anything without the equality key would
    degenerate to broadcast-nested-loop state and should be re-keyed first.

    ``how``: "inner" (default) emits matches as both sides arrive;
    "left_outer"/"right_outer" additionally emit null-padded rows for
    unmatched state — but only once the WATERMARK passes the row's join
    window (the engine must prove no future match can arrive), so outer
    results trail the inner ones by up to watermark + gap of event time.
    """
    l = left.withWatermark(time_col, watermark).alias("l")
    r = right.withWatermark(time_col, watermark).alias("r")
    return l.join(
        r,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"l.{time_col}") >= F.col(f"r.{time_col}"))
        & (
            F.col(f"l.{time_col}")
            < F.col(f"r.{time_col}") + F.expr(f"INTERVAL {gap}")
        ),
        how,
    )
