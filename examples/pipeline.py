"""LLM training-data pipeline walkthrough over the synthetic documents table:
quality scoring -> exact dedup -> near-dup pairs -> temperature-balanced
sample -> chunk + pack -> one-plan curation chain.

Run: python examples/pipeline.py  (uses /root/testdata/sf0.001)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qafs_spark.pipeline import curation, dedup, sampling, text
from qafs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="qafs-spark-pipeline-example")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
print(f"corpus: {docs.count()} docs")

# 1. quality signals (one tokenize pass, pure Catalyst expressions)
quality = text.quality_table(docs, "text", "doc_id")
quality.orderBy(F.desc("quality")).show(3)

# 2. exact dedup by content hash, then near-dup PAIRS via MinHash+LSH
unique = dedup.drop_exact_dups(docs, "text", "doc_id")
print(f"after exact dedup: {unique.count()}")
pairs = dedup.minhash_lsh_dedup(unique, "text", "doc_id", threshold=0.6)
print(f"near-dup pairs (J>=0.6): {pairs.count()}")

# 3. temperature-balanced sample across languages (integer-exact thresholds)
sample = sampling.temperature_sample(unique, "lang", "doc_id", target_rows=200)
sample.groupBy("lang").count().orderBy("lang").show()

# 4. context-window chunking + sequence packing for training
chunks = text.chunk_documents(sample, "text", "doc_id", max_tokens=64, overlap=8)
chunks = chunks.withColumn(
    "chunk_uid", F.concat_ws("#", F.col("doc_id"), F.col("chunk_idx"))
)
packs = text.pack_sequences(chunks, "chunk_text", "chunk_uid", budget=256)
print(f"chunks: {chunks.count()}, "
      f"packs: {packs.select('pack_id').distinct().count()}")

# 5. or run the whole curation chain as ONE lazy plan
curated = curation.curate(
    docs,
    benchmark=docs.limit(5),  # pretend the first 5 docs are an eval set
    sample_fraction=0.5,
)
print(f"curated survivors: {curated.count()}")
spark.stop()
