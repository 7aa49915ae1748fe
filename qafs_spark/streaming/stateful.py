"""Custom stateful streaming operator: per-key last-write-wins state.

The batch engine's read path applies last-write-wins (J3) over append-only
storage; this operator maintains the same semantics *online*: for each key it
keeps the value with the maximum ``(time, created_time)`` across all
micro-batches and emits the key's current state whenever it changes.

Implemented with ``applyInPandasWithState`` (Arrow-batched, per-key state in
the state store — the Spark-native way to express a custom stateful
operator; SURVEY §2.9). State size is one row per key; the shuffle is the
same hash-by-key exchange a batch ``groupBy`` would use, so a 1000-executor
cluster partitions the keyspace, not the history.

Why not ``flatMapGroupsWithState`` semantics w/ timeouts: feature state has
no natural expiry (the "current value" of a feature is forever queryable);
callers needing TTL can pass ``timeout="ProcessingTimeTimeout"`` and handle
``state.hasTimedOut`` themselves in a wrapper.
"""

from __future__ import annotations

from typing import Iterator, List, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def latest_state_stream(
    events: DataFrame,
    key_cols: List[str],
    time_col: str = "time",
    created_col: str = "created_time",
    value_col: str = "value",
) -> DataFrame:
    """Streaming per-key LWW: emits ``key_cols + (time, created_time, value)``
    for every key whose current value changed in the micro-batch.

    Output equals the batch ``last_write_wins`` + ``last()`` chain applied to
    everything seen so far — asserted against that batch oracle in tests.
    """
    key_fields = [events.schema[k] for k in key_cols]
    val_field = events.schema[value_col]
    out_schema = T.StructType(
        list(key_fields)
        + [
            T.StructField(time_col, T.TimestampType()),
            T.StructField(created_col, T.TimestampType()),
            T.StructField(value_col, val_field.dataType),
        ]
    )
    # state rows: (time_us, created_us, value) — timestamps as int64 epochs
    # because state schemas round-trip through Arrow scalars
    state_schema = T.StructType(
        [
            T.StructField("t_us", T.LongType()),
            T.StructField("c_us", T.LongType()),
            T.StructField("v", val_field.dataType),
        ]
    )

    def update(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        best = state.get if state.exists else None  # (t_us, c_us, v)
        changed = False
        for pdf in pdfs:
            if pdf.empty:
                continue
            t_us = pdf[time_col].astype("datetime64[us]").astype("int64")
            c_us = pdf[created_col].astype("datetime64[us]").astype("int64")
            # batch-local winner first (vectorized), then merge with state
            i = pd.DataFrame({"t": t_us, "c": c_us}).sort_values(["t", "c"]).index[-1]
            cand = (int(t_us[i]), int(c_us[i]), pdf[value_col].iloc[i])
            if best is None or (cand[0], cand[1]) > (best[0], best[1]):
                best = cand
                changed = True
        if changed:
            state.update(best)
            yield pd.DataFrame(
                [
                    dict(
                        zip([k for k in key_cols], key),
                        **{
                            time_col: pd.Timestamp(best[0], unit="us"),
                            created_col: pd.Timestamp(best[1], unit="us"),
                            value_col: best[2],
                        },
                    )
                ]
            )

    return (
        events.groupBy(*key_cols)
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Streaming exact dedup: emit each distinct content exactly ONCE,
    first-seen-wins across micro-batches (ties inside a batch: min id).

    The ingestion-side counterpart of :func:`~qafs_spark.pipeline.dedup.
    exact_dedup`: state is keyed by content md5 (one boolean-sized row per
    distinct content — the same key the batch groupBy shuffles on), so a
    continuously-arriving corpus deduplicates online instead of re-scanning
    history every batch. Emits ``(content_hash, id)`` of first-seen docs.

    State growth is one row per DISTINCT content — the theoretical minimum
    for exact streaming dedup; near-dup variants belong in batch where the
    candidate joins are expressible.
    """
    import hashlib

    from pyspark.sql import functions as F

    key_field_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("content_hash", T.StringType()),
            T.StructField(id_col, key_field_type),
        ]
    )
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    hashed = docs.withColumn("content_hash", F.md5(F.col(text_col)))

    def update(key, pdfs, state: GroupState):
        if state.exists:
            return  # content already emitted in an earlier batch
        best = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            m = pdf[id_col].min()
            best = m if best is None else min(best, m)
        if best is not None:
            state.update((True,))
            yield pd.DataFrame([{"content_hash": key[0], id_col: best}])

    return (
        hashed.groupBy("content_hash")
        .applyInPandasWithState(
            update,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
