#!/usr/bin/env python3
"""In-process alternating A/B of the exact-Jaccard verify shape.

Builds a realistic stored index (minhash_index of sf0.1 documents written
to parquet) and a realistic candidate set (band self-join, exact mode),
then alternates:

  A (current): verif = cand >< sh_a >< sh_b      (2 scans of (id, sh))
  B (pivot):   explode pair ids, 1 scan, groupBy pivot

Both evaluated with a noop write; spark.catalog.clearCache() between runs.
Alternation inside ONE JVM cancels the box's hour-scale drift.
"""
import os, sys, time, tempfile, shutil

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F
from qafs_spark.session import get_spark
from qafs_spark.pipeline.incremental import minhash_index, _banded
from qafs_spark.pipeline import dedup as dd

spark = get_spark(app_name="ab-verify-shape")
spark.range(1000).selectExpr("sum(id) s").write.format("noop").mode("overwrite").save()

docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
root = tempfile.mkdtemp(prefix="abverify_")
idx_path = os.path.join(root, "index")
minhash_index(docs, "text", "doc_id", 3, 32, 42).write.parquet(idx_path)

index = spark.read.parquet(idx_path)
banded = _banded(index, 16, 2)
cand = (
    banded.alias("a")
    .join(banded.alias("b"),
          (F.col("a.band") == F.col("b.band")) & (F.col("a.id") < F.col("b.id")))
    .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
    .dropDuplicates(["id_a", "id_b"])
)
# materialize candidates to parquet so BOTH variants read the same cheap
# input and the timing isolates the verify stage
cand_path = os.path.join(root, "cand")
cand.write.parquet(cand_path)
cand = spark.read.parquet(cand_path)
n_cand = cand.count()
n_idx = index.count()
print(f"# index rows={n_idx} cand pairs={n_cand}", flush=True)

sh_all = index.select("id", "sh")

def variant_a():
    sh_a = sh_all.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh_all.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return cand.join(sh_a, "id_a").join(sh_b, "id_b")

def variant_b():
    e = cand.select("id_a", "id_b",
                    F.explode(F.array("id_a", "id_b")).alias("id"))
    m = sh_all.join(F.broadcast(e), "id")
    return m.groupBy("id_a", "id_b").agg(
        F.any_value(F.when(F.col("id") == F.col("id_a"), F.col("sh")), True).alias("sh_a"),
        F.any_value(F.when(F.col("id") == F.col("id_b"), F.col("sh")), True).alias("sh_b"),
    )

def finish(verif):
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    return (verif.select("id_a", "id_b", (inter / union).alias("jaccard"))
            .filter(F.col("jaccard") >= 0.5))

# row-set equality check first
ra = finish(variant_a()).collect()
rb = finish(variant_b()).collect()
sa = sorted((r.id_a, r.id_b, r.jaccard) for r in ra)
sb = sorted((r.id_a, r.id_b, r.jaccard) for r in rb)
print(f"# equality: {'IDENTICAL' if sa == sb else 'MISMATCH'} ({len(sa)} vs {len(sb)} rows)", flush=True)

N = 6
res = {"A": [], "B": []}
for i in range(N):
    for name, fn in (("A", variant_a), ("B", variant_b)):
        spark.catalog.clearCache()
        t0 = time.time()
        finish(fn()).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        res[name].append(dt)
        print(f"# round{i} {name}: {dt}", flush=True)

for k, v in res.items():
    print(f"{k}: runs={v} min={min(v)} median={sorted(v)[len(v)//2]}")
shutil.rmtree(root, ignore_errors=True)
