"""Version-stable reading of the events table (physical TIMESTAMP(NANOS)).

Spark has no nanosecond timestamp type, and HOW the parquet scan surfaces a
TIMESTAMP(NANOS) column changed across versions:

* Spark <= 4.0 honors ``spark.sql.legacy.parquet.nanosAsLong`` and surfaces
  the column as BIGINT nanoseconds-since-epoch;
* Spark >= 4.1 (installed: 4.1.2) ignores that conf and surfaces it as
  TIMESTAMP_NTZ already truncated to microseconds.

Round 3 fixed the batch path but left the streaming queries forcing a
LongType schema + ``div 1000`` — on 4.1 the forced-long stream read yields
MICROsecond values, so the division collapsed a month of events into two
1-hour windows (CORRECTNESS_r03: stream_tumbling 10 rows vs oracle 3385).

This module is the single place that knows about the difference; every
events consumer (batch ``_t``, streaming queries, examples) goes through it.

Reference parity note: the reference ingests pandas datetimes and never
faces this (rodrigobaron/qafs src/qafs/core.py feature ingest); this is a
Spark-runtime concern only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: columns of the synthetic events table, sans the version-dependent ts
_EVENT_FIELDS = [
    ("event_id", T.LongType()),
    ("ts", None),  # filled per probed dtype
    ("user_id", T.LongType()),
    ("event_type", T.StringType()),
    ("value", T.DoubleType()),
    ("props", T.StringType()),
]


#: per-path probe cache — the surfaced dtype is a property of (Spark
#: version, file), both fixed for a process; ~40 catalog queries call
#: read_events at plan build and need not re-read the footer each time
_TS_DTYPE_CACHE: dict = {}

_NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


def _with_nanos_as_long(spark: SparkSession):
    """Context manager: set the legacy nanos conf, restoring the caller's
    prior session state (including "unset") on exit. The conf is a shared
    session knob — on Spark <= 4.0 leaving it set would silently change how
    every OTHER nanos-parquet read in the user's session surfaces."""
    from contextlib import contextmanager

    @contextmanager
    def _cm():
        try:
            prior = spark.conf.get(_NANOS_AS_LONG)
        except Exception:
            prior = None
        spark.conf.set(_NANOS_AS_LONG, "true")
        try:
            yield
        finally:
            if prior is None:
                try:
                    spark.conf.unset(_NANOS_AS_LONG)
                except Exception:
                    pass
            else:
                spark.conf.set(_NANOS_AS_LONG, prior)

    return _cm()


def probe_event_ts_dtype(spark: SparkSession, path: str) -> str:
    """Driver-side, metadata-only probe: how does THIS Spark surface the
    nanos ts column? Returns the simpleString dtype (``bigint``,
    ``timestamp_ntz``, ...). Reads footer schema only — no job.

    The legacy conf is set only for the duration of the probe and the
    caller's prior session state is restored — the probe itself must not
    leak config into the user's session. On runtimes that honor the conf
    (probe result ``bigint``), the *read* paths below re-set it durably,
    because there the conf is required for the scan to decode at all.
    """
    cached = _TS_DTYPE_CACHE.get(path)
    if cached is not None:
        return cached
    with _with_nanos_as_long(spark):
        dtype = dict(spark.read.parquet(path).dtypes)["ts"]
    _TS_DTYPE_CACHE[path] = dtype
    return dtype


def _ensure_read_conf(spark: SparkSession, ts_dtype: str) -> None:
    """On a runtime that surfaces nanos as BIGINT (Spark <= 4.0, conf
    honored), the conf must be in effect when the scan *executes*, not just
    when the footer was probed — and it must be set on every call, not only
    on probe-cache misses, so a second SparkSession in the same process
    (fresh conf, warm cache) still reads consistently with the cached probe.
    On Spark >= 4.1 the conf is ignored and we leave the session untouched."""
    if ts_dtype == "bigint":
        spark.conf.set(_NANOS_AS_LONG, "true")


def normalize_event_ts(df: DataFrame, ts_dtype: str) -> DataFrame:
    """Rewrite ``ts`` to a session-TZ TIMESTAMP (micros) whatever the scan
    surfaced. Works identically on batch and streaming DataFrames."""
    if ts_dtype == "bigint":
        # integer `div`, never double division: ns epochs exceed 2^53
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_dtype == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    if ts_dtype == "timestamp":
        return df
    # fail loudly at the read site rather than as a downstream hash mismatch
    raise ValueError(f"unexpected events.ts dtype: {ts_dtype!r}")


def event_stream_schema(ts_dtype: str) -> T.StructType:
    """Stream-read schema matching what the batch scan surfaces — file
    streams require an explicit schema, and it must agree with the runtime's
    parquet nanos handling or values are silently reinterpreted."""
    if ts_dtype == "bigint":
        ts_field = T.LongType()
    elif ts_dtype in ("timestamp_ntz",):
        ts_field = T.TimestampNTZType()
    elif ts_dtype == "timestamp":
        ts_field = T.TimestampType()
    else:
        raise ValueError(f"unexpected events.ts dtype: {ts_dtype!r}")
    return T.StructType(
        [
            T.StructField(name, ts_field if name == "ts" else dtype)
            for name, dtype in _EVENT_FIELDS
        ]
    )


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch read of ``{sf_dir}/events.parquet`` with ts normalized."""
    path = f"{sf_dir}/events.parquet"
    ts_dtype = probe_event_ts_dtype(spark, path)
    _ensure_read_conf(spark, ts_dtype)
    return normalize_event_ts(spark.read.parquet(path), ts_dtype)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming read of the same file with ts normalized. Probes the batch
    schema once at plan build (driver-side footer read) so the stream schema
    always matches the runtime's surfacing of TIMESTAMP(NANOS)."""
    from ..streaming import read_event_stream

    path = f"{sf_dir}/events.parquet"
    ts_dtype = probe_event_ts_dtype(spark, path)
    _ensure_read_conf(spark, ts_dtype)
    stream = read_event_stream(
        spark, sf_dir, schema=event_stream_schema(ts_dtype), glob="events.parquet"
    )
    return normalize_event_ts(stream, ts_dtype)
