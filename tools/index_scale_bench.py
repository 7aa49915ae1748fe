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
    args = ap.parse_args()

    from qafs_spark.session import get_spark
    from qafs_spark.pipeline.banded_index import BandedMinHashIndex
    from qafs_spark.pipeline.vector_index import CellVectorIndex
    from make_scaled_sf import scale_embeddings

    spark = get_spark(app_name="index-scale-bench")
    base_n = spark.read.parquet(f"{args.src}/embeddings.parquet").count()
    factor = max(1, args.vectors // base_n)
    emb_path = os.path.join(args.work, f"embeddings_x{factor}.parquet")
    if not os.path.exists(emb_path):
        print(f"# building {factor}x embeddings fixture...", file=sys.stderr)
        scale_embeddings(spark, args.src, emb_path, factor)
    emb = spark.read.parquet(emb_path)
    n = emb.count()
    out = {"n_vectors": n, "nlist": args.nlist, "batches": args.batches}

    if args.serve or args.retrain:
        vroot = os.path.join(args.work, "vx")
        if not os.path.exists(vroot):
            print("no ingested index at", vroot, file=sys.stderr)
            return 1
        vx = CellVectorIndex(spark, vroot, nlist=args.nlist)
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
    vroot = os.path.join(args.work, "vx")
    shutil.rmtree(vroot, ignore_errors=True)
    vx = CellVectorIndex(spark, vroot, nlist=args.nlist)
    vrows = []
    for b in range(args.batches):
        part = emb.filter(F.col("vec_id") % args.batches == b)
        t0 = time.time()
        vx.apply_batch(part, b, threshold=args.threshold)
        dt = time.time() - t0
        rows = n // args.batches
        vrows.append({"batch": b, "sec": round(dt, 1),
                      "rows_per_sec": round(rows / dt)})
        print(f"# vector batch {b}: {dt:.1f}s", file=sys.stderr)
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
        cnt = semdedup.semantic_pairs(
            emb, "embedding", "vec_id", threshold=args.threshold
        ).count()
        out["semantic_pairs"] = {"sec": round(time.time() - t0, 1),
                                 "pairs": cnt}
        print(f"# semantic_pairs: {out['semantic_pairs']}", file=sys.stderr)

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
