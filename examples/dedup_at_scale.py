"""Round-6 dedup walkthrough: SemDeDup semantic dedup over embeddings,
an incremental MinHash index fed batch-by-batch, and the streaming
near-dup sink that maintains the index via Structured Streaming.

Run: python examples/dedup_at_scale.py  (uses /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qafs_spark.pipeline import incremental, semdedup
from qafs_spark.session import get_spark
from qafs_spark.streaming.dedup_lsh import streaming_minhash_dedup

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="qafs-spark-dedup-example")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")

# --- 1. SemDeDup: keep one representative per semantic-duplicate group ----
# The DEFAULT is the scale tier: cells auto-sized to ~1024 assigned rows
# (nlist = ceil(n*nprobe/1024), multiprobe nprobe=2), so this same call
# does LINEAR total pair work at 100 TB; corpora <=4096 rows
# short-circuit to exact all-pairs (exact=True forces that at any size).
decision = semdedup.semantic_dedup(emb, "embedding", "vec_id", threshold=0.4)
kept = decision.filter("keep")
print(f"semantic dedup: kept {kept.count()} of {emb.count()} vectors")
# the IVF tier — same decision, cell-bounded work:
ivf_decision = semdedup.semantic_dedup(
    emb, "embedding", "vec_id", threshold=0.4, nlist=8
)
print(f"  IVF tier kept {ivf_decision.filter('keep').count()}")

# --- 2. Incremental dedup: yesterday's corpus is an index, today's batch -
# is deduped against it without re-reading yesterday's text.
old = docs.filter(F.col("doc_id") % 5 != 0)
batch = docs.filter(F.col("doc_id") % 5 == 0)
index = incremental.minhash_index(old, "text", "doc_id")
pairs, new_rows = incremental.incremental_minhash_dedup(
    batch, index, "text", "doc_id", num_bands=16, threshold=0.5
)
print(f"incremental: {pairs.count()} near-dup pairs touch the new batch")
# appending new_rows to the stored index completes the cycle:
updated_index = index.unionByName(new_rows)
print(f"  index grows {index.count()} -> {updated_index.count()} docs")

# --- 3. Streaming: the same cycle run by Structured Streaming ------------
root = tempfile.mkdtemp(prefix="qafs_dedup_example_")
src = os.path.join(root, "in")
os.makedirs(src)
for k in range(2):
    staged = os.path.join(root, f"stage{k}")
    docs.filter(F.col("doc_id") % 2 == k).coalesce(1).write.parquet(staged)
    part = next(f for f in os.listdir(staged) if f.endswith(".parquet"))
    os.rename(os.path.join(staged, part), os.path.join(src, f"b{k}.parquet"))

stream = (
    spark.readStream.schema(
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )
    .option("maxFilesPerTrigger", 1)
    .parquet(src)
)
q = streaming_minhash_dedup(
    stream,
    os.path.join(root, "index"),
    os.path.join(root, "pairs"),
    os.path.join(root, "ckpt"),
    num_bands=16,
    threshold=0.5,
)
q.awaitTermination(300)
log = spark.read.parquet(os.path.join(root, "pairs"))
print(
    f"streaming: {log.count()} pairs accumulated across "
    f"{log.select('batch_id').distinct().count()} micro-batches"
)

spark.stop()
