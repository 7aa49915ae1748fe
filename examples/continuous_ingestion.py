"""Round-7 continuous-ingestion walkthrough: the two persisted,
partition-pruned dedup indexes — banded MinHash for text, cell-partitioned
IVF for embeddings — driven batch-by-batch with exactly-once commits,
merge-on-read deletes, compaction, and ANN serving from the same store.

Run: python examples/continuous_ingestion.py  (uses /root/testdata/sf0.001)
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from qafs_spark.pipeline.banded_index import BandedMinHashIndex
from qafs_spark.pipeline.vector_index import CellVectorIndex
from qafs_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")

    # ---- text: banded MinHash index, fed in three daily batches --------
    root = tempfile.mkdtemp(prefix="ix_text_")
    text_ix = BandedMinHashIndex(
        spark, root, n=3, num_hashes=32, num_bands=16, num_partitions=16
    )
    for day in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == day)
        applied = text_ix.apply_batch(
            batch, day, text_col="text", id_col="doc_id", threshold=0.5
        )
        print(f"day {day}: applied={applied}, "
              f"pairs so far={text_ix.pairs().count()}")
    # a replayed batch is a no-op (exactly-once)
    assert not text_ix.apply_batch(
        docs.filter(F.col("doc_id") % 3 == 0), 0,
        text_col="text", id_col="doc_id", threshold=0.5,
    )
    # GDPR delete: tombstone a document, then fold history + drop it
    victim = docs.select("doc_id").first()["doc_id"]
    text_ix.delete_ids([victim])
    removed = text_ix.compact()
    print(f"compacted {removed} batch dirs; doc {victim} physically gone: "
          f"{victim not in [r['id'] for r in text_ix.doc_rows().collect()]}")

    # ---- embeddings: cell-partitioned vector index ----------------------
    vroot = tempfile.mkdtemp(prefix="ix_vec_")
    vec_ix = CellVectorIndex(spark, vroot, nlist=8)
    for day in range(3):
        vec_ix.apply_batch(
            emb.filter(F.col("vec_id") % 3 == day), day,
            threshold=0.85, tier="ivf",
        )
    print(f"semantic pairs: {vec_ix.pairs().count()}")
    # ANN serving straight from the same store, reading only probed cells
    queries = emb.limit(3)
    vec_ix.search(queries, k=5, nprobe=2).show(15, truncate=False)

    # ---- lexical: persisted BM25 index + hybrid fusion -----------------
    from qafs_spark.pipeline.retrieval import rrf_fuse
    from qafs_spark.pipeline.text_index import InvertedIndex

    troot = tempfile.mkdtemp(prefix="ix_bm25_")
    bm_ix = InvertedIndex(spark, troot, num_partitions=16)
    for day in range(3):
        bm_ix.apply_batch(docs.filter(F.col("doc_id") % 3 == day), day)
    lexical = bm_ix.search(["data", "model"], k=10).select(
        F.col("doc").alias("doc_id"), "rank"
    )
    vector = vec_ix.search(emb.limit(1), k=10, nprobe=2).select(
        F.col("neighbor_id").alias("doc_id"), "rank"
    )
    print("hybrid top-5 (RRF over BM25 + ANN):")
    rrf_fuse([lexical, vector], k=5).show(truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
