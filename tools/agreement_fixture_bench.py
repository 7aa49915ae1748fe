#!/usr/bin/env python3
"""Exact-vs-IVF SemDeDup agreement on a CLUSTERED fixture.

Round-10 verdict task 5: on the synthetic sf1 embeddings, the
threshold-0.4 pair graph is nearly complete, so the exact/IVF keep-set
agreement number there certifies nothing (any partition of a complete
graph keeps ~one representative). Real corpora are clustered — duplicate
groups are tight blobs separated by empty space — and that is where the
IVF tier's keep-set should agree with exact. This tool generates such a
fixture and reports the RAW Jaccard agreement (not just the 0.5-gated
boolean) at user-scale thresholds:

* ``k`` well-separated centroid directions (random 64-dim gaussians are
  near-orthogonal: pairwise |cosine| ~ N(0, 1/64));
* each member = centroid + 0.35·|c|·gaussian noise → within-cluster
  member cosine ≈ 1/(1+0.35²) ≈ 0.89, member-to-centroid ≈ 0.94,
  cross-cluster ≈ 0 ± 0.15 — so thresholds 0.7/0.85 cut exactly at the
  cluster boundary, the regime users run semantic dedup in.

Usage: python tools/agreement_fixture_bench.py [--sizes 2000 20000]
       [--thresholds 0.7 0.85] [--clusters-per-1k 50] [--seed 42]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_embeddings(n: int, clusters_per_1k: int, dim: int, seed: int):
    """(vec_id, embedding) rows: n vectors in ~n*clusters_per_1k/1000
    well-separated blobs, deterministic in (n, seed)."""
    rng = np.random.RandomState(seed)
    k = max(2, (n * clusters_per_1k) // 1000)
    cents = rng.standard_normal((k, dim))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    labels = rng.randint(0, k, size=n)
    noise = rng.standard_normal((n, dim)) * (0.35 / np.sqrt(dim))
    vecs = cents[labels] + noise
    return [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[2000, 20000])
    ap.add_argument("--thresholds", type=float, nargs="+", default=[0.7, 0.85])
    ap.add_argument("--clusters-per-1k", type=int, default=50)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from qafs_spark.pipeline import semdedup as sdd
    from qafs_spark.session import get_spark

    spark = get_spark(app_name="agreement-fixture-bench")
    results = []
    for n in args.sizes:
        rows = clustered_embeddings(n, args.clusters_per_1k, args.dim, args.seed)
        df = spark.createDataFrame(rows, ["vec_id", "embedding"]).persist()
        df.count()
        for thr in args.thresholds:
            exact = sdd.semantic_dedup(
                df, "embedding", "vec_id", threshold=thr, k_iters=3,
                exact=True,
            ).select("id", F.col("keep").alias("keep_e"))
            # the AUTO tier exactly as default-arg users get it (at
            # n<=4096 it short-circuits to exact; force the IVF tier so
            # the 2k point measures the quantizer too)
            nlist = max(2, -(-(n * 2) // 1024))
            approx = sdd.semantic_dedup(
                df, "embedding", "vec_id", threshold=thr, k_iters=3,
                nlist=nlist, nprobe=2,
            ).select("id", F.col("keep").alias("keep_x"))
            j = exact.join(approx, "id").agg(
                F.sum((F.col("keep_e") & F.col("keep_x")).cast("long")).alias("i"),
                F.sum((F.col("keep_e") | F.col("keep_x")).cast("long")).alias("u"),
                F.sum(F.col("keep_e").cast("long")).alias("ke"),
                F.sum(F.col("keep_x").cast("long")).alias("kx"),
            ).collect()[0]
            results.append({
                "n": n, "threshold": thr, "nlist": nlist,
                "kept_exact": int(j["ke"]), "kept_ivf": int(j["kx"]),
                "agreement_jaccard": round(j["i"] / max(1, j["u"]), 4),
            })
            print(json.dumps(results[-1]))
        df.unpersist()
    print(json.dumps({"results": results}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
