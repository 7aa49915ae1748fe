#!/usr/bin/env python3
"""Same-session A/B/A ANN-serving comparison of two CellVectorIndex
roots (round 14: float64 vs float32 shared blocks — cross-session serve
numbers on this host drift ±30%, so dtype claims need one session).

Usage:
  python tools/serve_aba.py <root_a> <root_b> --fixture <embeddings.parquet>
      [--dtype-a float64] [--dtype-b float32] [--k 10] [--rounds 2]

Alternates A,B per round (A B A B ...), 10k queries each, reports
per-run seconds and the per-dtype medians. Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root_a")
    ap.add_argument("root_b")
    ap.add_argument("--fixture", required=True)
    ap.add_argument("--dtype-a", default="float64")
    ap.add_argument("--dtype-b", default="float32")
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--nprobe", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from qafs_spark.session import get_spark
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    spark = get_spark(app_name="serve-aba")
    emb = spark.read.parquet(args.fixture)
    queries = emb.filter(F.col("vec_id") % 100 == 0).persist()
    nq = queries.count()

    ix = {
        "a": CellVectorIndex(spark, args.root_a, nlist=args.nlist,
                             block_dtype=args.dtype_a),
        "b": CellVectorIndex(spark, args.root_b, nlist=args.nlist,
                             block_dtype=args.dtype_b),
    }
    runs = {"a": [], "b": []}
    rows = {}
    order = ["a", "b"] * args.rounds + ["a"]  # A B A B ... A
    for slot in order:
        t0 = time.time()
        rows[slot] = ix[slot].search(
            queries, k=args.k, nprobe=args.nprobe
        ).count()
        dt = round(time.time() - t0, 1)
        runs[slot].append(dt)
        ix[slot].unpersist_intermediates()
        print(f"# {slot} ({getattr(ix[slot], 'block_dtype')}): {dt}s",
              file=sys.stderr)
    out = {
        "n_queries": nq, "k": args.k, "nprobe": args.nprobe,
        "dtype_a": args.dtype_a, "dtype_b": args.dtype_b,
        "runs_a_sec": runs["a"], "runs_b_sec": runs["b"],
        "median_a_sec": statistics.median(runs["a"]),
        "median_b_sec": statistics.median(runs["b"]),
        "rows_a": rows["a"], "rows_b": rows["b"],
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
