"""Benchmark decontamination: find and drop training docs that overlap an
evaluation set by shared word n-grams.

The standard training-data hygiene step (n-gram collision against held-out
benchmarks, cf. GPT-3/C4-style 13-gram decontamination): a training document
is *contaminated* if it shares at least ``min_hits`` distinct word n-grams
with any benchmark document.

Plan shape (all JVM-side, reuses the dedup module's staged shingle→md5
pipeline):

1. both sides → ``(id, shingle_hash)`` via tokenize → n-gram → md5-int,
   ``array_distinct`` then ``explode`` — narrow, codegen;
2. benchmark side is *small by nature* (eval sets are KBs–MBs against a
   100 TB corpus) → ``broadcast`` its distinct shingle set: the probe is a
   broadcast-hash **semi** join on the exploded training shingles — no
   shuffle of the corpus at all;
3. per-doc distinct-hit count + threshold; contaminated ids are again tiny →
   broadcast anti join to produce the clean corpus.

At scale the only wide operation is the per-doc hit count (hash aggregate on
doc_id, map-side partial); the corpus is otherwise read once, filtered in
place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import with_shingle_hashes


def ngram_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Per-corpus-doc count of distinct n-gram hashes shared with the
    benchmark: ``(doc_id, hits)``, hits >= 1 only (non-overlapping docs are
    absent — left-join + coalesce at the call site if 0-rows are wanted).
    """
    corpus_grams = with_shingle_hashes(corpus, text_col, id_col, n).select(
        "id", F.explode("sh").alias("g")
    )
    bench_grams = (
        with_shingle_hashes(benchmark, text_col, id_col, n)
        .select(F.explode("sh").alias("g"))
        .distinct()
    )
    return (
        corpus_grams.join(F.broadcast(bench_grams), "g", "leftsemi")
        .groupBy("id")
        .agg(F.count("*").alias("hits"))
        .select(F.col("id").alias(id_col), "hits")
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
) -> DataFrame:
    """Corpus minus contaminated docs (≥ ``min_hits`` shared n-grams)."""
    dirty = (
        ngram_hits(corpus, benchmark, text_col, id_col, n)
        .filter(F.col("hits") >= min_hits)
        .select(id_col)
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")


def fingerprint_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 8,
    w: int = 4,
    min_shared: int = 3,
) -> DataFrame:
    """Winnowing-fingerprint contamination: corpus docs sharing >=
    ``min_shared`` winnowing fingerprints with the benchmark.

    N-gram decontam (:func:`ngram_hits`) breaks if the leaked copy was
    lightly edited; winnowing fingerprints (Schleimer et al., SIGMOD'03 —
    the MOSS plagiarism detector) guarantee any shared substring of length
    >= k + w - 1 leaves at least one shared fingerprint, so edits must
    disturb EVERY window to evade it. Same scale shape as ngram_hits: the
    benchmark's fingerprint set broadcasts, the corpus is never shuffled
    whole — only per-doc hit counts aggregate.
    """
    from .text import winnowing_table

    cfp = winnowing_table(corpus, text_col, id_col, k=k, w=w).select(
        F.col("id").alias(id_col), F.explode("fp").alias("h")
    )
    bfp = (
        winnowing_table(benchmark, text_col, id_col, k=k, w=w)
        .select(F.explode("fp").alias("h"))
        .distinct()
    )
    return (
        cfp.join(F.broadcast(bfp), "h")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("hits"))
        .filter(F.col("hits") >= min_shared)
    )
