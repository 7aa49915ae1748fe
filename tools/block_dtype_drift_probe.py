#!/usr/bin/env python3
"""Round-14: measure the TRUE float32 shared-block cosine drift on
vectors that are NOT float32-representable (the scale fixture's signed
permutation expansion preserves its float32-clean source values, so its
f32-vs-f64 diff is exactly zero — a parity datapoint, not a drift one).

Builds n random float64 Gaussian vectors at the given dim, ingests a
seed half + dedups the other half through two CellVectorIndexes that
differ only in block_dtype, and reports pair-set agreement + cosine
drift stats at a mid threshold (pairs near the threshold are the ones
that could flip).

Usage: python tools/block_dtype_drift_probe.py [--n 100000] [--dim 768]
Prints ONE JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=768)
    ap.add_argument("--nlist", type=int, default=64)
    ap.add_argument("--threshold", type=float, default=0.2)
    ap.add_argument("--work", default="/tmp/qafs_dtype_probe")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    from qafs_spark.session import get_spark
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    spark = get_spark(app_name="block-dtype-drift-probe")
    # deterministic Gaussian-ish float64 vectors: sums of seeded rands
    # are NOT float32-representable, unlike the decade fixture. Planted
    # near-dups: each row i in the dedup half pairs with seed row i-1
    # via a tiny perturbation, giving above-threshold edges near 1.0,
    # while random pairs cluster near cos ~ 0 (dim 768) — the 0.2
    # threshold keeps only planted pairs but their cosines differ from
    # 1.0 enough to exercise rounding.
    # build vectors via hash-seeded uniform sums (deterministic, f64)
    cols = []
    for rep in range(3):
        cols.append(
            F.transform(
                F.sequence(F.lit(1), F.lit(args.dim)),
                lambda j: (
                    F.pmod(
                        F.xxhash64(F.col("vec_id") * F.lit(2654435761 + rep), j),
                        F.lit(10_000_019),
                    ).cast("double")
                    / F.lit(10_000_019.0)
                    - F.lit(0.5)
                ),
            )
        )
    vec = F.zip_with(
        F.zip_with(cols[0], cols[1], lambda a, b: a + b),
        cols[2],
        lambda a, b: a + b,
    )
    df = spark.range(args.n).select(
        F.col("id").alias("vec_id"), vec.alias("embedding")
    )
    seed = df.filter(F.col("vec_id") % 2 == 0)
    # dedup half: seed row's vector plus a small deterministic nudge on
    # coordinate 0 — cosine lands ~0.97-0.999, well above threshold but
    # sensitive to rounding in the last bits
    probe = seed.select(
        (F.col("vec_id") + 1).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: F.when(i == 0, x + F.lit(0.05)).otherwise(x),
        ).alias("embedding"),
    )

    def run(dtype, sub):
        root = os.path.join(args.work, sub)
        shutil.rmtree(root, ignore_errors=True)
        ix = CellVectorIndex(
            spark, root, nlist=args.nlist, block_dtype=dtype
        )
        ix.apply_batch(seed, 0, threshold=args.threshold)
        ix.apply_batch(probe, 1, threshold=args.threshold)
        return spark.read.parquet(ix.pairs_path).select(
            "id_a", "id_b", "cosine"
        )

    a = run("float64", "v64").withColumnRenamed("cosine", "c64")
    b = run("float32", "v32").withColumnRenamed("cosine", "c32")
    j = a.join(b, ["id_a", "id_b"], "full_outer").persist()
    out = {
        "n": args.n, "dim": args.dim, "threshold": args.threshold,
        "pairs_f64": a.count(), "pairs_f32": b.count(),
        "only_in_f64": j.filter(F.col("c32").isNull()).count(),
        "only_in_f32": j.filter(F.col("c64").isNull()).count(),
    }
    drift = (
        j.filter(F.col("c32").isNotNull() & F.col("c64").isNotNull())
        .select(F.abs(F.col("c32") - F.col("c64")).alias("d"))
        .agg(F.max("d").alias("max"),
             F.expr("percentile_approx(d, 0.99)").alias("p99"),
             F.avg("d").alias("mean"))
        .collect()[0]
    )
    out["cosine_drift"] = {k: float(drift[k]) for k in ("max", "p99", "mean")}
    print(json.dumps(out))
    shutil.rmtree(args.work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
