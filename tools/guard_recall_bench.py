#!/usr/bin/env python3
"""Measure the `max_cell_size` ingest guard's TRUE-PAIR recall at scale.

Round-10 verdict task 4: the round-9 100k-vector guard datapoint was
vacuous — pure-rotation replicas contain zero true pairs at 0.85, so
"recall" had an empty denominator. The scaled fixture now PLANTS
ground-truth near-dups (make_scaled_sf._emb_rep: ~9% of each replica is
a 0.1-blend of its base, cosine >= ~0.995), and this bench ingests the
fixture through CellVectorIndex twice — guarded (default
max_cell_size=4096) and unguarded (None) — and reports:

* planted-pair recall of each run (found / planted, threshold 0.85);
* wall time of each ingest (the guard's speed side);
* the guard's pair-survival ratio (guarded recall / unguarded recall).

The unguarded run is the IVF ceiling (cross-cell planted pairs are
missed by BOTH runs — that is the quantizer trade, certified elsewhere);
the guard's own cost is the survival ratio, and the verdict bar is
guarded recall >= 0.95 absolute.

Usage: python tools/guard_recall_bench.py [--factor 50]
       [--src /root/testdata/sf0.1] [--work /tmp/qafs_guard_recall]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=50)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/qafs_guard_recall")
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--nlist", type=int, default=16)
    # default: OMIT nprobe so the run measures apply_batch's own ingest
    # default (nprobe=2 since round 11) — the config a user actually gets
    ap.add_argument("--nprobe", type=int, default=None)
    args = ap.parse_args()

    from qafs_spark.session import get_spark
    from qafs_spark.pipeline.vector_index import CellVectorIndex
    from make_scaled_sf import planted_pairs, scale_embeddings

    spark = get_spark(app_name="guard-recall-bench")
    emb_path = os.path.join(args.work, f"embeddings_x{args.factor}.parquet")
    if not os.path.exists(emb_path):
        scale_embeddings(spark, args.src, emb_path, args.factor)
    emb = spark.read.parquet(emb_path)
    n = emb.count()

    planted = planted_pairs(spark, args.src, args.factor).persist()
    n_planted = planted.count()

    def run(tag: str, max_cell_size):
        root = os.path.join(args.work, f"ix_{tag}")
        shutil.rmtree(root, ignore_errors=True)
        ix = CellVectorIndex(spark, root, nlist=args.nlist)
        kw = {} if args.nprobe is None else {"nprobe": args.nprobe}
        t0 = time.time()
        ix.apply_batch(
            emb, 0, vec_col="embedding", id_col="vec_id",
            threshold=args.threshold, tier="ivf",
            max_cell_size=max_cell_size, **kw,
        )
        dt = time.time() - t0
        found = ix.pairs().select("id_a", "id_b")
        hits = planted.join(found, ["id_a", "id_b"], "left_semi").count()
        return {"time_sec": round(dt, 1), "hits": hits,
                "recall": round(hits / max(1, n_planted), 4)}

    guarded = run("guarded", 4096)
    unguarded = run("unguarded", None)
    out = {
        "n_vectors": n,
        "n_planted_pairs": n_planted,
        "threshold": args.threshold,
        "nlist": args.nlist,
        "nprobe": args.nprobe if args.nprobe is not None else "default(2)",
        "guarded": guarded,
        "unguarded": unguarded,
        "survival_vs_unguarded": round(
            guarded["recall"] / max(unguarded["recall"], 1e-9), 4
        ),
        "speedup": round(unguarded["time_sec"] / max(guarded["time_sec"], 1e-9), 2),
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
