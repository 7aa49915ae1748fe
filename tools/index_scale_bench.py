#!/usr/bin/env python3
"""One more scale decade for the persisted indexes (round-11 verdict
task 5): a standing 1M-vector / 50k-doc fixture, with per-batch ingest
timings and a cell-skew histogram.

The 100-TB design claims previously stopped at 100k vectors (the round-10
guard table). This bench:

* builds (once, cached) a 1M-vector embeddings fixture — factor 500 of
  sf0.1 via ``make_scaled_sf.scale_embeddings`` (replicas past 64 get the
  round-11 signed-rotation transform, so no accidental exact clones) —
  and reuses the standing sf1 fixture's 50k documents;
* ingests the vectors through ``CellVectorIndex`` (DEFAULT config:
  nprobe=2, max_cell_size guard on) in equal batches, reporting each
  batch's wall time and rows/sec — the near-flat-per-row-cost check;
* reports the stored cell-occupancy histogram (min/p50/p90/p99/max rows
  per cell) — the skew the ``max_cell_size`` guard must bound;
* ingests the 50k docs through ``BandedMinHashIndex`` in equal batches,
  same per-batch report;
* times one ``semdedup.semantic_pairs`` auto-tier run at the full 1M.

Usage:
  python tools/index_scale_bench.py [--vectors 1000000] [--batches 4]
      [--nlist 256] [--skip-banded] [--skip-semdedup]

Prints ONE JSON line. Wall-clock is dominated by the vector ingest
(~minutes per batch at 250k rows on local[32]).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--nlist", type=int, default=256)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--work", default="/tmp/qafs_scale_decade")
    ap.add_argument("--threshold", type=float, default=0.85)
    ap.add_argument("--skip-banded", action="store_true")
    ap.add_argument("--skip-semdedup", action="store_true")
    # --serve / --retrain reuse the index a prior ingest run left in
    # --work (error if absent) and SKIP ingest: ANN serving latency at
    # scale (10k queries, k=10, nprobe 1 and 2) / quantizer retrain cost
    ap.add_argument("--serve", action="store_true")
    ap.add_argument("--retrain", action="store_true")
    # --skewed: the clustered fixture (make_scaled_sf.scale_embeddings_
    # skewed — ~30% of rows blended toward one direction) instead of the
    # uniform rotations; additionally reports semantic_pairs' planted-
    # pair recall, since the guard's sub-bucketing is the live code
    # path there (round-12 verdict task 2)
    ap.add_argument("--skewed", action="store_true")
    # --drift (with --skewed): cold rows fill batches 0..B-2, the hot
    # 30% arrives ONLY in the last batch — the quantizer (frozen at
    # batch 0) never saw the hot mass, so its cells go genuinely hot:
    # the regime k-means absorbs when it trains on the full data (the
    # static-skew 100k probe measured only ~6x max/min occupancy) but
    # cannot absorb under data drift. This is the _cell_guard /
    # _self_pair_guard engagement proof at scale.
    ap.add_argument("--drift", action="store_true")
    # --dim: expand the fixture vectors to a realistic embedding dim
    # (make_scaled_sf._expand_dim — a linear isometry, so cosines and
    # the planted ground truth are EXACT while bytes/flops/shuffle
    # volume scale honestly). Default keeps the source dim (64).
    ap.add_argument("--dim", type=int, default=None)
    # --block-dtype: CellVectorIndex shared-block vecs artifact dtype
    # (round 14): float32 halves per-node artifact bytes; the drift
    # table vs the float64 parity run lands in BENCH_NOTES.
    ap.add_argument("--block-dtype", default="float64",
                    choices=["float64", "float32"])
    # --skip-stale: omit the stale-quantizer drift leg (the wide-dim
    # runs measure ingest/recall/serving; the stale regime is pinned at
    # 64 and 768)
    ap.add_argument("--skip-stale", action="store_true")
    args = ap.parse_args()

    # local[32] runs all "executors" in ONE JVM: at dim 768 the guard's
    # cached 1M-row assignment frame is ~6 GB of columnar batches whose
    # 32-way concurrent build OOMs the stock 8g heap (measured round 13)
    # — a real cluster sizes executor heap per core-count, so the bench
    # does too. Override with SPARK_DRIVER_MEMORY.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

    from qafs_spark.session import get_spark
    from qafs_spark.pipeline.banded_index import BandedMinHashIndex
    from qafs_spark.pipeline.vector_index import CellVectorIndex
    from make_scaled_sf import scale_embeddings, scale_embeddings_skewed

    spark = get_spark(app_name="index-scale-bench")
    base_n = spark.read.parquet(f"{args.src}/embeddings.parquet").count()
    factor = max(1, args.vectors // base_n)
    stem = "embeddings_skew" if args.skewed else "embeddings"
    dtag = f"_d{args.dim}" if args.dim else ""
    emb_path = os.path.join(args.work, f"{stem}_x{factor}{dtag}.parquet")
    if not os.path.exists(emb_path):
        print(f"# building {factor}x {stem}{dtag} fixture...",
              file=sys.stderr)
        if args.skewed:
            scale_embeddings_skewed(
                spark, args.src, emb_path, factor, dim_out=args.dim
            )
        else:
            scale_embeddings(
                spark, args.src, emb_path, factor, dim_out=args.dim
            )
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    out = {"n_vectors": n, "nlist": args.nlist, "batches": args.batches,
           "skewed": bool(args.skewed),
           "dim": args.dim or len(emb.select("embedding").first()[0]),
           "block_dtype": args.block_dtype}

    if args.serve or args.retrain:
        vroot = os.path.join(args.work, "vx")
        if not os.path.exists(vroot):
            print("no ingested index at", vroot, file=sys.stderr)
            return 1
        vx = CellVectorIndex(spark, vroot, nlist=args.nlist,
                             block_dtype=args.block_dtype)
        if args.serve:
            queries = emb.filter(F.col("vec_id") % 100 == 0)  # ~n/100
            nq = queries.count()
            serve = {"n_queries": nq}
            for npb in (1, 2):
                t0 = time.time()
                got = vx.search(queries, k=10, nprobe=npb).count()
                serve[f"nprobe{npb}"] = {
                    "sec": round(time.time() - t0, 1), "rows": got,
                }
                print(f"# search nprobe={npb}: {serve[f'nprobe{npb}']}",
                      file=sys.stderr)
            out["search"] = serve
        if args.retrain:
            t0 = time.time()
            moved = vx.retrain(nlist=args.nlist * 2)
            out["retrain"] = {"sec": round(time.time() - t0, 1),
                              "rows_reassigned": moved,
                              "new_nlist": args.nlist * 2}
            print(f"# retrain: {out['retrain']}", file=sys.stderr)
        print(json.dumps(out))
        return 0

    # -- vector index ingest, DEFAULT config, equal batches ---------------
    hot = (F.col("vec_id") % 10) < 3  # the skewed fixture's hot selector

    def batch_filter(b: int):
        if args.drift:
            if b < args.batches - 1:
                return (~hot) & (F.col("vec_id") % (args.batches - 1) == b)
            return hot
        return F.col("vec_id") % args.batches == b

    vroot = os.path.join(args.work, "vx")
    shutil.rmtree(vroot, ignore_errors=True)
    vx = CellVectorIndex(spark, vroot, nlist=args.nlist,
                         block_dtype=args.block_dtype)
    vrows = []
    for b in range(args.batches):
        part = emb.filter(batch_filter(b))
        rows = part.count() if args.drift else n // args.batches
        t0 = time.time()
        vx.apply_batch(part, b, threshold=args.threshold)
        dt = time.time() - t0
        vrows.append({"batch": b, "sec": round(dt, 1), "rows": rows,
                      "rows_per_sec": round(rows / dt)})
        print(f"# vector batch {b}: {dt:.1f}s ({rows} rows)",
              file=sys.stderr)
    out["vector_ingest"] = vrows

    # cell-skew histogram over the stored assignments
    occ = (
        spark.read.parquet(vx.vectors_path)
        .groupBy("cell").agg(F.count(F.lit(1)).alias("rows"))
        .agg(
            F.count(F.lit(1)).alias("cells"),
            F.min("rows").alias("min"),
            F.expr("percentile_approx(rows, 0.5)").alias("p50"),
            F.expr("percentile_approx(rows, 0.9)").alias("p90"),
            F.expr("percentile_approx(rows, 0.99)").alias("p99"),
            F.max("rows").alias("max"),
        )
        .collect()[0]
    )
    out["cell_histogram"] = {k: int(occ[k]) for k in
                             ["cells", "min", "p50", "p90", "p99", "max"]}
    out["pairs_found"] = vx.pairs().count()

    # -- semantic_pairs auto tier at full scale ---------------------------
    if not args.skip_semdedup:
        from qafs_spark.pipeline import semdedup

        t0 = time.time()
        sp = semdedup.semantic_pairs(
            emb, "embedding", "vec_id", threshold=args.threshold
        )
        if args.skewed:
            # persist so the count and the planted-recall join replay
            # one pair computation, not two
            sp = sp.persist()
        cnt = sp.count()
        out["semantic_pairs"] = {"sec": round(time.time() - t0, 1),
                                 "pairs": cnt}
        print(f"# semantic_pairs: {out['semantic_pairs']}", file=sys.stderr)
        if args.skewed:
            from make_scaled_sf import planted_pairs

            pp = planted_pairs(spark, args.src, factor).persist()
            n_pp = pp.count()
            hits = sp.join(pp, ["id_a", "id_b"], "inner").count()
            out["semantic_pairs"]["planted"] = n_pp
            out["semantic_pairs"]["planted_recall"] = round(hits / n_pp, 4)
            print(f"# planted recall: {hits}/{n_pp}", file=sys.stderr)
            sp.unpersist()

            if args.skip_stale:
                pp.unpersist()
                print(json.dumps(out))
                return 0
            # STALE-quantizer variant: centroids trained on the COLD
            # 70% only (the drift scenario semantic dedup meets in a
            # scheduled pipeline: yesterday's quantizer, today's data).
            # The hot mass funnels into the few cells whose centroids
            # carry the dominant component — _self_pair_guard is the
            # live path; record the probed-cell histogram it sees, its
            # wall-clock, and the planted recall THROUGH the guard.
            from qafs_spark.pipeline.similarity import (
                _probe_cells, ivf_train, norm,
            )

            auto_nlist = max(4, -(-(n * 2) // 1024))
            t0 = time.time()
            cents = ivf_train(
                emb.filter((F.col("vec_id") % 10) >= 3),
                nlist=auto_nlist, iters=1,
                data_id="vec_id", data_vec="embedding",
            )
            train_sec = round(time.time() - t0, 1)
            probes = _probe_cells(cents, 2)
            pocc = (
                emb.select(
                    F.explode(probes(F.col("embedding"))).alias("cell")
                )
                .groupBy("cell").agg(F.count(F.lit(1)).alias("rows"))
                .agg(
                    F.count(F.lit(1)).alias("cells"),
                    F.expr("percentile_approx(rows, 0.5)").alias("p50"),
                    F.expr("percentile_approx(rows, 0.99)").alias("p99"),
                    F.max("rows").alias("max"),
                ).collect()[0]
            )
            t0 = time.time()
            sp2 = semdedup.semantic_pairs(
                emb, "embedding", "vec_id", threshold=args.threshold,
                centroids=cents, nprobe=2,
            ).persist()
            cnt2 = sp2.count()
            hits2 = sp2.join(pp, ["id_a", "id_b"], "inner").count()
            out["semantic_pairs_stale_quantizer"] = {
                "train_sec": train_sec, "nlist": auto_nlist,
                "probed_cells": {k: int(pocc[k])
                                 for k in ["cells", "p50", "p99", "max"]},
                "sec": round(time.time() - t0, 1), "pairs": cnt2,
                "planted_recall": round(hits2 / n_pp, 4),
            }
            print(f"# stale-quantizer: "
                  f"{out['semantic_pairs_stale_quantizer']}",
                  file=sys.stderr)
            sp2.unpersist()
            pp.unpersist()

    # -- banded index over the standing sf1 50k docs ----------------------
    if not args.skip_banded:
        sf1 = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/qafs_sf1")
        docs_path = f"{sf1}/documents.parquet"
        if os.path.exists(docs_path):
            docs = spark.read.parquet(docs_path)
            nd = docs.count()
            broot = os.path.join(args.work, "bx")
            shutil.rmtree(broot, ignore_errors=True)
            bx = BandedMinHashIndex(spark, broot)
            brows = []
            for b in range(args.batches):
                part = docs.filter(F.col("doc_id") % args.batches == b)
                t0 = time.time()
                bx.apply_batch(part, b, threshold=0.5)
                dt = time.time() - t0
                brows.append({"batch": b, "sec": round(dt, 1),
                              "rows_per_sec": round(nd / args.batches / dt)})
                print(f"# banded batch {b}: {dt:.1f}s", file=sys.stderr)
            out["n_docs"] = nd
            out["banded_ingest"] = brows
        else:
            out["banded_ingest"] = f"skipped: no sf1 fixture at {sf1}"

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
