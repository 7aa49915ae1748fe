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

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination — the 100 TB variant
# ---------------------------------------------------------------------------
# ngram_hits broadcasts the benchmark's RAW distinct-gram set. That is fine
# for eval sets (MBs), but a large held-out suite at 13-grams can reach
# many GBs of 64-bit hashes — past broadcast limits. The classic fix
# (Bloom, CACM'70; same trick Spark's own runtime row-level filtering
# uses): broadcast a fixed-size Bloom BITMAP of the benchmark grams
# (m_bits/8 bytes, e.g. 2 MB at m=2^24 — independent of gram count),
# prefilter the corpus grams map-side with ZERO false negatives, then run
# the exact-membership join only over the tiny surviving candidate set.
# The final answer is EXACT (the verify join removes Bloom's false
# positives); the bitmap only decides how little data reaches the shuffle.

def _bloom_probe_cols(g: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for one gram hash: Kirsch–Mitzenmacher double
    hashing pos_i = (h1 + i*h2) mod m over a single xxhash64 evaluation.
    h2 is forced odd so (with m a power of two) the probe stride is
    coprime with m and the k positions never collapse onto one slot."""
    h = F.xxhash64(g)
    h1 = F.pmod(h, F.lit(m_bits))
    h2 = F.pmod(F.shiftright(h, 32), F.lit(m_bits)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]


def bloom_build(
    grams: DataFrame, gram_col: str = "g", m_bits: int = 1 << 24, k: int = 4
) -> DataFrame:
    """Distributed Bloom-bitmap build: ``(word, bits)`` rows, one per
    NON-ZERO 64-bit word of the m_bits-wide bitmap.

    Each gram contributes k single-bit masks; ``bit_or`` with map-side
    partial aggregation collapses them so the shuffle carries at most
    m_bits/64 rows no matter how many grams went in. The sparse (word,
    bits) form doubles as the broadcast payload — absent words mean 0."""
    pos = grams.select(
        F.explode(F.array(*_bloom_probe_cols(F.col(gram_col), m_bits, k))).alias("p")
    )
    # SQL-form shiftleft: the Python F.shiftleft only accepts a literal int
    # shift amount; the SQL function takes a column expression.
    return pos.groupBy(F.shiftright(F.col("p"), 6).alias("word")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))")
        ).alias("bits")
    )


def bloom_prefilter(
    items: DataFrame,
    bitmap: DataFrame,
    gram_col: str = "g",
    m_bits: int = 1 << 24,
    k: int = 4,
) -> DataFrame:
    """Rows of ``items`` whose ``gram_col`` MAY be in the Bloom set (all k
    probed bits set). No false negatives; false-positive rate ~
    (1 - e^(-k·n/m))^k.

    Plan shape: k BROADCAST left joins of the (word, bits) bitmap — the
    corpus stream is never shuffled; each probe is a hash-map lookup plus
    two bit-ops, all inside whole-stage codegen. A missing word coalesces
    to 0 (bit not set)."""
    out = items
    keep = None
    for i, pos in enumerate(_bloom_probe_cols(F.col(gram_col), m_bits, k)):
        p, w, b = f"__bp{i}", f"__bw{i}", f"__bb{i}"
        out = (
            out.withColumn(p, pos)
            .withColumn(w, F.shiftright(F.col(p), 6))
            # SQL-form shiftleft: the Python API's shift amount must be a
            # literal int; the SQL function accepts a column.
            .withColumn(
                b,
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(pmod({p}, 64) AS INT))"),
            )
        )
        bm = F.broadcast(
            bitmap.select(F.col("word").alias(w), F.col("bits").alias(f"__bs{i}"))
        )
        out = out.join(bm, w, "left")
        hit = F.coalesce(F.col(f"__bs{i}"), F.lit(0)).bitwiseAND(F.col(b)) != 0
        keep = hit if keep is None else keep & hit
    return out.filter(keep).drop(
        *[c for i in range(k) for c in (f"__bp{i}", f"__bw{i}", f"__bb{i}", f"__bs{i}")]
    )


def bloom_ngram_hits(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    m_bits: int = 1 << 24,
    k: int = 4,
) -> DataFrame:
    """:func:`ngram_hits` semantics (identical exact output) with a Bloom
    prefilter between the corpus and the membership join.

    1. benchmark grams → :func:`bloom_build` bitmap (one small shuffle on
       the benchmark side only);
    2. corpus grams → :func:`bloom_prefilter` — map-side, no false
       negatives, so no true hit can be lost;
    3. the surviving (id, gram) pairs — a tiny fraction of the corpus at
       any realistic false-positive rate — join the TRUE benchmark gram
       set WITHOUT a broadcast hint (the raw set may exceed broadcast
       limits; that is the point of this variant — AQE picks the
       strategy for the shrunken candidate side), which removes Bloom's
       false positives; per-doc distinct-hit counts follow as in
       ngram_hits.
    """
    from pyspark import StorageLevel

    corpus_grams = with_shingle_hashes(corpus, text_col, id_col, n).select(
        "id", F.explode("sh").alias("g")
    )
    # persist: bench_grams feeds the bitmap build AND the verify join —
    # one benchmark tokenize pass, not two
    bench_grams = (
        with_shingle_hashes(benchmark, text_col, id_col, n)
        .select(F.explode("sh").alias("g"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # persist: the k probe joins each build their own BroadcastExchange
    # (the per-probe column renames defeat exchange reuse) — without this
    # the benchmark-side hash+bit_or aggregate would re-run k times. The
    # k broadcast COPIES of the small bitmap remain, which is the right
    # trade (a corpus-side shuffle to share one copy would cost far more).
    bitmap = bloom_build(bench_grams, "g", m_bits, k).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    candidates = bloom_prefilter(corpus_grams, bitmap, "g", m_bits, k)
    return (
        candidates.join(bench_grams, "g", "leftsemi")
        .groupBy("id")
        .agg(F.count("*").alias("hits"))
        .select(F.col("id").alias(id_col), "hits")
    )


def bloom_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_hits: int = 1,
    m_bits: int = 1 << 24,
    k: int = 4,
) -> DataFrame:
    """:func:`decontaminate` semantics (corpus minus contaminated docs)
    over the Bloom-prefiltered hit path — use when the benchmark gram set
    outgrows broadcast limits. The contaminated-id set is small by nature,
    so its anti join still broadcasts."""
    dirty = (
        bloom_ngram_hits(corpus, benchmark, text_col, id_col, n, m_bits, k)
        .filter(F.col("hits") >= min_hits)
        .select(id_col)
    )
    return corpus.join(F.broadcast(dirty), id_col, "left_anti")


def contamination_attribution(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """For each contaminated corpus doc, WHICH benchmark doc it overlaps
    most: ``(doc_id, bench_doc_id, shared_grams)`` — the diagnostics
    companion to :func:`ngram_hits` (knowing *that* a doc is contaminated
    says to drop it; knowing *which* benchmark leaked says what to audit
    upstream). Ties break toward the smallest benchmark id.

    Plan: the benchmark's (gram, bench_id) pairs broadcast (still
    eval-set-sized — per-id grams are a constant factor over the distinct
    set); per-(corpus doc, bench doc) shared-gram counts aggregate
    map-side; the per-doc argmax is a ``max(struct(cnt, -bench_id))``
    partial aggregate — no windows over data rows, corpus never shuffled
    except by its own doc id."""
    corpus_grams = with_shingle_hashes(corpus, text_col, id_col, n).select(
        "id", F.explode("sh").alias("g")
    )
    bench_grams = with_shingle_hashes(benchmark, text_col, id_col, n).select(
        F.col("id").alias("__bid"), F.explode("sh").alias("g")
    )
    pair_counts = (
        corpus_grams.join(F.broadcast(bench_grams), "g")
        .groupBy("id", "__bid")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    best = pair_counts.groupBy("id").agg(
        F.max(
            F.struct(F.col("shared"), (-F.col("__bid")).alias("__nbid"))
        ).alias("_m")
    )
    return best.select(
        F.col("id").alias(id_col),
        (-F.col("_m.__nbid")).alias("bench_doc_id"),
        F.col("_m.shared").alias("shared_grams"),
    )
