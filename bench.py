#!/usr/bin/env python3
"""Headline benchmark: runs the flagship queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {name: sec, ...}, "sf": <sf>}.

Each query is forced end-to-end with a `noop` write (full materialization on
executors, nothing collected to the driver) so the timing measures the real
distributed plan, not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Representative slice of the catalog: feature-store core (ingest/load
# semantics), analytic joins/aggs, and the training-data pipeline ops.
# Heavy certification/continuous-ingestion ops, benched SEPARATELY with
# `--heavy` (the headline set above stays untouched round-over-round so
# A/B comparisons stay valid). These are the most expensive operators in
# the repo; BENCH_NOTES.md tracks this section per round.
HEAVY = [
    "semantic_dedup",
    "semantic_dedup_agreement",
    "semantic_dedup_multiprobe",
    "incremental_dedup",
    "banded_incremental_dedup",
    "stream_incremental_dedup",
    "stream_banded_dedup",
    "dedup_clusters",
]

HEADLINE = [
    "feature_roundtrip",
    "lww_dedup",
    "time_travel",
    "resample_asof",
    "align_ffill",
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "top_customers_per_nation",
    "sessionize",
    "token_stats_by_source",
    "tpch_q6",
    "quality_score",
    "simhash_pairs",
    "exact_dedup",
    "minhash_lsh_dedup",
    "ann_topk",
    "tpch_q10",
    "tpch_q18",
    "tpch_q7",
    "decontam_hits",
    "hash_sample",
]


def run_maint(spark, sf_dir: str, sf) -> int:
    """Maintenance-path bench (`--maint`): build each persisted index
    once from the fixture, then time the lifecycle rewrites — tombstone
    + pairs scrub, parameter rebuilds, quantizer retrain with nlist
    growth. A THIRD separately-totaled set (metric `maint-ops-total`)
    so the headline/heavy sets stay untouched for ABA comparability
    (same flag-stability rule BENCH_NOTES mandates for --heavy)."""
    import shutil
    import tempfile

    from qafs_spark.pipeline.banded_index import BandedMinHashIndex
    from qafs_spark.pipeline.text_index import InvertedIndex
    from qafs_spark.pipeline.vector_index import CellVectorIndex

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    root = tempfile.mkdtemp(prefix="bench_maint_")
    timings = {}

    def t(name, fn):
        t0 = time.time()
        fn()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    try:
        bx = BandedMinHashIndex(spark, f"{root}/bx")
        t("banded_build", lambda: bx.apply_batch(docs, 0, threshold=0.5))
        victims = [r[0] for r in docs.select("doc_id").limit(50).collect()]
        t("banded_delete_scrub",
          lambda: (bx.delete_ids(victims), bx.scrub_pairs(victims)))
        t("banded_rebuild",
          lambda: bx.rebuild(num_hashes=64, num_bands=16))
        vx = CellVectorIndex(spark, f"{root}/vx", nlist=16)
        t("vector_build", lambda: vx.apply_batch(emb, 0, threshold=0.85))
        t("vector_retrain_grow", lambda: vx.retrain(nlist=32))
        ix = InvertedIndex(spark, f"{root}/ix", num_partitions=64)
        t("inverted_build", lambda: ix.apply_batch(docs, 0))
        t("inverted_rebuild", lambda: ix.rebuild(num_partitions=32))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({
        "metric": "maint-ops-total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


def main() -> int:
    # --sf-dir overrides $SPARK_GRAFT_SF_DIR: the scale-regime loop
    # (BENCH_NOTES "Scale-regime" sections) points this at a synthetic sf1
    # built by tools/make_scaled_sf.py for round-over-round tracking above
    # the largest shipped fixture.
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    args = sys.argv[1:]
    if "--sf-dir" in args:
        sf_dir = args[args.index("--sf-dir") + 1]
    import re

    m = re.search(r"sf([0-9.]+)$", os.path.basename(sf_dir.rstrip("/")))
    try:
        sf = float(m.group(1)) if m else None
    except ValueError:
        sf = None

    import __spark_entry__ as entrymod
    from qafs_spark.session import get_spark

    spark = get_spark(app_name="qafs-spark-bench")
    qs = entrymod.queries()

    # Warm the JVM paths once so per-query times measure the plan, not
    # first-run classloading: shuffle/agg, window codegen, and the Parquet
    # write committer + read path (first use costs seconds).
    import shutil
    import tempfile

    spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode(
        "overwrite"
    ).save()
    warm_dir = tempfile.mkdtemp(prefix="bench_warm_")
    try:
        from pyspark.sql import Window, functions as F

        w = spark.range(2000).select(
            F.col("id"),
            (F.col("id") % 7).alias("k"),
            F.timestamp_micros(F.col("id") * 1000000).alias("time"),
        )
        w.withColumn(
            "r", F.last("id", True).over(
                Window.partitionBy("k").orderBy("time")
                .rowsBetween(Window.unboundedPreceding, 0))
        ).write.mode("overwrite").partitionBy("k").parquet(f"{warm_dir}/p")
        spark.read.parquet(f"{warm_dir}/p").count()
        # two more first-use-expensive generic shapes: ordered-pick
        # aggregates (max_by) and array generation + explode
        w.groupBy("k").agg(F.max_by("id", F.col("time")).alias("m")).write.format(
            "noop"
        ).mode("overwrite").save()
        w.select(F.explode(F.sequence(F.lit(0), F.col("id") % 5)).alias("e")).write.format(
            "noop"
        ).mode("overwrite").save()
    finally:
        shutil.rmtree(warm_dir, ignore_errors=True)

    if "--maint" in args:
        return run_maint(spark, sf_dir, sf)
    heavy = "--heavy" in args
    names = HEAVY if heavy else HEADLINE
    timings = {}
    total = 0.0
    for name in names:
        if name == "feature_roundtrip":
            # attributed segments: ingest (partitioned write + registry)
            # vs load (pruned scan -> LWW -> bin-compressed resample)
            from qafs_spark.queries import feature_roundtrip_segments

            ingest, load, cleanup = feature_roundtrip_segments(spark, sf_dir)
            try:
                t0 = time.time()
                ingest()
                t_ingest = round(time.time() - t0, 3)
                t0 = time.time()
                load().write.format("noop").mode("overwrite").save()
                t_load = round(time.time() - t0, 3)
            finally:
                cleanup()
            timings["feature_roundtrip_ingest"] = t_ingest
            timings["feature_roundtrip_load"] = t_load
            timings[name] = round(t_ingest + t_load, 3)
            total += timings[name]
            print(f"# {name}: {timings[name]:.2f}s "
                  f"(ingest {t_ingest:.2f}s, load {t_load:.2f}s)",
                  file=sys.stderr)
            continue
        if name not in qs:
            continue
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"# {name}: {dt:.2f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "heavy-ops-total" if heavy else "headline-queries-total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
