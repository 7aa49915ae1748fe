"""Round-8 walkthrough: anchored calendar grids, quantizer retrain on a
drifting embedding corpus, star-contraction labels feeding a
leakage-free split, and a feature store rooted on a remote webhdfs://
endpoint.

Run: python examples/maintenance_and_drift.py  (uses /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from qafs_spark.pipeline import dedup, sampling
from qafs_spark.pipeline.vector_index import CellVectorIndex
from qafs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="qafs-spark-maintenance-example")
work = tempfile.mkdtemp(prefix="qafs_example_")

# --- 1. Anchored calendar resample ---------------------------------------
# "M" snaps exactly like pd.date_range / resample("ME"): month-END grid
# points rolled forward from from_date, month-end re-snap per step.
from qafs_spark.operators.resample import resample_asof

orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
daily = orders.groupBy(
    F.date_trunc("day", F.col("o_orderdate")).alias("time")
).agg(F.sum("o_totalprice").alias("revenue"))
monthly = resample_asof(
    daily, ["revenue"], pd.Timestamp("1995-01-15"),
    pd.Timestamp("1995-12-10"), "M",
)
print("month-end grid (anchored 'M'):")
monthly.show(4)

# --- 2. Quantizer retrain on a drifting corpus ----------------------------
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
idx = CellVectorIndex(spark, f"{work}/vx", nlist=8)
idx.apply_batch(emb, 0, threshold=0.95)           # trains the quantizer
# a "drifted" second batch: two tight clusters in directions the frozen
# first-batch centroids never saw (the topic-shift scenario)
import random

rng = random.Random(5)
centers = [[0.0] * 64, [0.0] * 64]
centers[0][40] = 1.0
centers[1][50] = 1.0
drifted = spark.createDataFrame(
    [
        (1_000_000 + j,
         [c + rng.gauss(0, 0.01) for c in centers[j % 2]])
        for j in range(60)
    ],
    "vec_id long, embedding array<double>",
).select("vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
idx.apply_batch(drifted, 1, threshold=0.95)
queries = drifted.limit(5)


def recall_at(k=5):
    exact = {(r["query_id"], r["neighbor_id"])
             for r in idx.search(queries, k=k, nprobe=8).collect()}
    pruned = {(r["query_id"], r["neighbor_id"])
              for r in idx.search(queries, k=k, nprobe=1).collect()}
    return len(exact & pruned) / max(len(exact), 1)


before = recall_at()
idx.retrain()                                      # crash-safe swap, version bump
after = recall_at()
print(f"nprobe=1 recall@5: {before:.2f} before retrain -> {after:.2f} "
      f"after (quantizer v{idx.version()})")

# --- 3. Star-contraction labels -> leakage-free split ---------------------
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
pairs = dedup.ngram_jaccard_pairs(
    docs, "text", "doc_id", n=3, threshold=0.5, max_doc_frac=None
)
# O(log n) rounds on ANY chain length (vs min-label's O(diameter));
# materialize once, reuse for dedup AND the split
labels = dedup.cluster_pairs_star(pairs)
labels.write.mode("overwrite").parquet(f"{work}/labels")
labels = spark.read.parquet(f"{work}/labels")
split = sampling.leakage_free_split(
    docs, None, "doc_id", test_fraction=0.1, labels=labels
)
split.groupBy("split").count().show()

# --- 4. Feature store on a remote webhdfs:// root -------------------------
from qafs_spark import Column, FeatureStore
from qafs_spark.testing.webhdfs import WebHdfsServer

with WebHdfsServer(f"{work}/whroot") as srv:
    fs = FeatureStore(
        storage=srv.url + "/store",
        db_connection=f"{work}/fs.db",
        spark=spark,
    )
    fs.create_namespace("demo")
    fs.create_feature("demo/x", check=Column(float))
    fs.save_df(pd.DataFrame({
        "time": pd.date_range("2021-01-01", periods=5),
        "demo/x": [float(i) for i in range(5)],
    }))
    print("loaded over webhdfs://:")
    fs.load_features("demo/x").show()

print("done")
