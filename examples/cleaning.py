"""Corpus-cleaning walkthrough: C4-style line
and three-sentence-span dedup, PII redaction, and a downsampled feature
rollup materialized back into the store — plus the round-6 additions:
Bloom-prefiltered decontamination, DSIR selection, topic clustering.

Run: python examples/cleaning.py  (uses /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F

from qafs_spark import Column, FeatureStore
from qafs_spark.pipeline.text import dedup_lines, dedup_spans, redact_pii
from qafs_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark(app_name="qafs-spark-cleaning-example")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

# give the single-line fixture docs some multi-line structure: a shared
# footer every doc carries, plus a per-source tag
structured = docs.select(
    "doc_id",
    F.concat_ws(
        "\n", F.col("text"),
        F.concat(F.lit("from: "), F.col("source")),
        F.lit("unsubscribe | terms | privacy"),
    ).alias("text"),
)

# 1. cross-corpus line dedup: boilerplate lines (shared by >= 2 docs) vanish
cleaned = dedup_lines(structured, "text", "doc_id")
cleaned.select("doc_id", "n_lines", "n_removed").show(3)

# 2. span dedup: duplicated three-sentence windows stripped everywhere
sentenced = docs.select(
    "doc_id",
    F.concat(
        F.lit("Welcome. Please read carefully. Thanks for visiting. "),
        F.col("text"), F.lit(" tail "), F.col("doc_id"), F.lit("."),
    ).alias("text"),
)
despanned = dedup_spans(sentenced, "text", "doc_id")
despanned.select("doc_id", "n_sentences", "n_removed_sentences").show(3)

# 3. PII scrub: typed placeholders + per-kind hit counts, map-only
with_pii = docs.select(
    "doc_id",
    F.concat(
        F.col("text"), F.lit(" reach me at user"),
        F.col("doc_id").cast("string"), F.lit("@example.org"),
    ).alias("text"),
)
scrubbed = redact_pii(with_pii, "text", "doc_id")
scrubbed.select("doc_id", "n_email", "text").show(2, truncate=60)

# 4. downsample + materialize: store an hourly series, persist its daily
# mean as a first-class feature in a rollups namespace
root = tempfile.mkdtemp(prefix="qafs_example_")
fs = FeatureStore(storage=root, spark=spark)
fs.create_namespace("raw")
fs.create_feature("raw/metric", check=Column(float))
dts = pd.date_range("2024-01-01", periods=96, freq="1h")
fs.save_df(pd.DataFrame({"time": dts, "raw/metric": [float(i % 24) for i in range(96)]}))
targets = fs.materialize(
    "raw/metric", "rollups", from_date="2024-01-01", to_date="2024-01-04",
    freq="1d", method="mean", suffix="_daily_mean",
)
fs.load_features(targets[0]).show()

# 5. Bloom-prefiltered decontamination: broadcast a fixed-size bitmap of
# the "benchmark" grams (not the raw gram set), prefilter map-side, then
# exact-verify — same answer as ngram_hits at any benchmark size
from qafs_spark.pipeline.decontam import bloom_ngram_hits, ngram_hits

corpus = docs.filter(F.col("doc_id") % 10 != 0)
bench = docs.filter(F.col("doc_id") % 10 == 0)
bloom_hits = bloom_ngram_hits(corpus, bench, n=4, m_bits=1 << 18, k=4)
exact_hits = ngram_hits(corpus, bench, n=4)
print("bloom==exact:", bloom_hits.exceptAll(exact_hits).count() == 0
      and exact_hits.exceptAll(bloom_hits).count() == 0)

# 6. DSIR importance selection: pick the 10 docs most like the English
# slice under hashed-unigram models (exact integer micro-nat scores)
from qafs_spark.pipeline.sampling import dsir_select

target = docs.filter(F.col("lang") == "en")
dsir_select(docs, target, k=10).show(5)

# 7. Topic clustering: nearest-centroid cosine assignment — centroids
# inline as literals, so assignment is map-only over the scan
from qafs_spark.pipeline.similarity import topic_cluster_stats

emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
cents = [(r.vec_id, r.embedding)
         for r in emb.filter(F.col("vec_id") < 4).collect()]
topic_cluster_stats(emb, cents).orderBy("cluster_id").show()

# 8. Contamination attribution: not just WHICH docs are dirty but which
# benchmark doc each one leaked from (most shared 4-grams, ties → lowest)
from qafs_spark.pipeline.decontam import contamination_attribution

contamination_attribution(corpus, bench, n=4).show(5)

# 9. Vocabulary-coverage audit: how few token types cover how much of the
# corpus (the Zipf curve a tokenizer-vocab decision reads)
from qafs_spark.pipeline.text import vocab_coverage

vocab_coverage(docs, "text", "doc_id", k=10).orderBy("rank").show()
