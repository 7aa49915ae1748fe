#!/usr/bin/env python3
"""Record the state-store size trajectory of the live-trigger streaming
soak (round-11 verdict task 3's BENCH_NOTES table).

Runs the same shape as tests/test_streaming_soak.py's stateful soak —
rate source → ``dedup_stream`` (applyInPandasWithState, keyed by content
md5 over a bounded content universe) → memory sink, live
``processingTime`` trigger — and samples ``stateOperators[0]`` every few
batches. The table shows state ROWS plateauing at the distinct-content
cardinality while rows READ keep growing: bounded state under unbounded
input, the property availableNow replays can't witness.

Usage: python tools/soak_state_bench.py [--batches 60] [--contents 1000]
       [--rows-per-sec 2000]
Prints ONE JSON line with the sample table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=60)
    ap.add_argument("--contents", type=int, default=1000)
    ap.add_argument("--rows-per-sec", type=int, default=2000)
    ap.add_argument("--timeout-sec", type=float, default=600.0)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from qafs_spark.session import get_spark
    from qafs_spark.streaming.stateful import dedup_stream

    spark = get_spark(
        app_name="soak-state-bench", master="local[8]", shuffle_partitions=8
    )
    docs = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", args.rows_per_sec)
        .load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat(
                F.lit("content-"), (F.col("value") % args.contents)
            ).alias("text"),
        )
    )
    q = (
        dedup_stream(docs)
        .writeStream.format("memory")
        .queryName("soak_state_bench")
        .outputMode("update")
        .trigger(processingTime="50 milliseconds")
        .start()
    )
    samples = []
    t0 = time.time()
    try:
        last = -1
        while last < args.batches and time.time() - t0 < args.timeout_sec:
            p = q.lastProgress
            if p is not None and int(p["batchId"]) != last:
                last = int(p["batchId"])
                ops = p.get("stateOperators") or []
                if ops and last % 5 == 0:
                    samples.append(
                        {
                            "batch": last,
                            "state_rows": int(ops[0]["numRowsTotal"]),
                            "rows_updated": int(ops[0]["numRowsUpdated"]),
                            "state_bytes": int(
                                ops[0]["memoryUsedBytes"]
                            ),
                            "input_rows": int(p.get("numInputRows", 0)),
                        }
                    )
            if q.exception() is not None:
                raise RuntimeError(str(q.exception()))
            time.sleep(0.2)
    finally:
        q.stop()
    emitted = spark.table("soak_state_bench").count()
    print(
        json.dumps(
            {
                "batches": last,
                "wall_sec": round(time.time() - t0, 1),
                "distinct_contents": args.contents,
                "emitted": emitted,
                "max_state_rows": max(s["state_rows"] for s in samples),
                "samples": samples,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
