#!/usr/bin/env python3
"""Round-14 verdict task 4: quantify the float32 shared-block drift at
scale. Compares two CellVectorIndex pair logs produced by IDENTICAL
drift-decade ingests that differ only in ``block_dtype`` (float64
parity vs float32), and reports:

* pair-set difference in both directions (pairs whose cosine crossed
  the threshold under float32 rounding — expected ~0, bounded by the
  <1e-6 drift at the 0.85 threshold);
* max / p99 |cosine_f32 - cosine_f64| over the shared pairs;
* planted-pair recall of the float32 run (same ground truth as the
  decade).

Usage:
  python tools/block_dtype_diff.py <pairs_f64_dir> <pairs_f32_dir> \
      [--src /root/testdata/sf0.1] [--factor 500]

Prints ONE JSON line (BENCH_NOTES table source).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pairs_f64")
    ap.add_argument("pairs_f32")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--factor", type=int, default=500)
    args = ap.parse_args()

    from qafs_spark.session import get_spark
    from make_scaled_sf import planted_pairs

    spark = get_spark(app_name="block-dtype-diff")
    a = spark.read.parquet(args.pairs_f64).select(
        "id_a", "id_b", F.col("cosine").alias("c64")
    )
    b = spark.read.parquet(args.pairs_f32).select(
        "id_a", "id_b", F.col("cosine").alias("c32")
    )
    j = a.join(b, ["id_a", "id_b"], "full_outer").persist()
    n64 = a.count()
    n32 = b.count()
    only64 = j.filter(F.col("c32").isNull()).count()
    only32 = j.filter(F.col("c64").isNull()).count()
    drift = (
        j.filter(F.col("c32").isNotNull() & F.col("c64").isNotNull())
        .select((F.abs(F.col("c32") - F.col("c64"))).alias("d"))
        .agg(
            F.max("d").alias("max"),
            F.expr("percentile_approx(d, 0.99)").alias("p99"),
            F.avg("d").alias("mean"),
        )
        .collect()[0]
    )
    pp = planted_pairs(spark, args.src, args.factor)
    n_pp = pp.count()
    hits32 = b.join(pp, ["id_a", "id_b"], "inner").count()
    out = {
        "pairs_f64": n64,
        "pairs_f32": n32,
        "only_in_f64": only64,
        "only_in_f32": only32,
        "cosine_drift": {
            "max": float(drift["max"]),
            "p99": float(drift["p99"]),
            "mean": float(drift["mean"]),
        },
        "planted": n_pp,
        "planted_recall_f32": round(hits32 / n_pp, 5),
    }
    j.unpersist()
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
