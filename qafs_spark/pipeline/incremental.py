"""Incremental near-dup detection against a persisted MinHash index.

The batch operators in :mod:`dedup` recompute shingles and signatures for
the WHOLE corpus on every run — correct, but at 100 TB a continuously-fed
training-data pipeline cannot afford to re-tokenize petabytes because a
daily batch arrived. The standard production shape (same LSH math as the
batch path) is to persist a per-document index — MinHash signature + the
distinct shingle-hash set — and, per incoming batch:

1. index only the NEW documents (the only text that gets tokenized);
2. derive band keys from stored signatures on both sides (a cheap map —
   ``lsh_band_keys`` over an ``array<long>`` column, no text access);
3. equi-join the new batch's bands against the index's bands for
   candidates (the new side is batch-sized → broadcast, so the corpus-
   sized index never shuffles), plus the within-batch self-join;
4. exact-verify candidates with the stored shingle sets (the candidate id
   set is tiny → the verify join prunes the index scan);
5. append the new rows to the index.

Determinism: signatures are md5-derived with a fixed seed, so the
incremental pair set over (old ∪ new) is bit-equal to the batch operator's
pairs restricted to pairs touching a new document — asserted by a parity
test, and the property that makes the incremental path oracle-checkable.

Index storage is just a DataFrame — persist it with
``df.write.parquet(...)`` (or bucket it by ``id`` for shuffle-free verify
joins); per-band bucket counts can be maintained alongside to make the
oversized-bucket guard O(1) per batch instead of an index-wide aggregate
(see ``incremental_minhash_dedup`` notes).
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import (
    DEFAULT_MAX_BAND_SIZE,
    lsh_band_keys,
    minhash_signature_from_hashes,
    tokens,
    with_shingle_hashes,
)


def minhash_index(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """Per-document dedup index rows: (id, sig, sh).

    ``sig`` is the MinHash signature (``array<long>``, length
    ``num_hashes``), ``sh`` the distinct shingle-hash set the exact-Jaccard
    verify needs. One map-only pass over the text — this is the ONLY place
    incremental dedup ever tokenizes, and each document is tokenized once
    in its lifetime. Documents with fewer than ``n`` tokens produce no row
    (they have no shingles, same contract as the batch operator).

    Band keys are deliberately NOT materialized here: they derive from
    ``sig`` with a cheap array slice at query time, so the index stays one
    row per document and re-banding (tuning ``num_bands``) needs no
    rebuild.
    """
    nonempty = df.filter(F.size(tokens(F.col(text_col))) >= n)
    base = with_shingle_hashes(nonempty, text_col, id_col, n)
    return base.select(
        "id",
        minhash_signature_from_hashes(F.col("sh"), num_hashes, seed).alias("sig"),
        "sh",
    )


def minhash_index_with_tokens(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """:func:`minhash_index` plus ``toks`` — the whitespace token stream
    ``sh`` derives from — for indexes that must RE-SHINGLE under a new
    ``n`` later (``BandedMinHashIndex(store_tokens=True).rebuild(n=...)``).
    (id, sig, sh) is bit-equal to :func:`minhash_index` (parity-tested);
    the extra column costs roughly the text itself in storage, which is
    why it is opt-in. Same staged-projection discipline as
    :func:`dedup.with_shingle_hashes` (nesting the lambdas re-evaluates
    tokenization per array element — O(tokens²) regex splits)."""
    from . import spread
    from .dedup import shingle_hashes

    t = tokens(F.col(text_col))
    s1 = (
        spread(df)
        .select(F.col(id_col).alias("id"), t.alias("toks"))
        .filter(F.size("toks") >= n)
    )
    s2 = s1.select(
        "id", "toks", _grams_from_tokens(F.col("toks"), n).alias("_grams")
    )
    s3 = s2.select(
        "id", "toks",
        F.array_distinct(shingle_hashes(F.col("_grams"))).alias("sh"),
    )
    return s3.select(
        "id",
        minhash_signature_from_hashes(F.col("sh"), num_hashes, seed).alias(
            "sig"
        ),
        "sh",
        "toks",
    )


def _grams_from_tokens(tk, n: int):
    """Distinct n-gram shingle strings from a token array — the exact
    expression :func:`dedup.with_shingle_hashes` builds from raw text,
    factored so stored token streams re-shingle bit-identically."""
    starts = F.sequence(F.lit(1), F.size(tk) - (n - 1))
    return F.array_distinct(
        F.transform(starts, lambda i: F.array_join(F.slice(tk, i, n), " "))
    )


def _banded(index: DataFrame, num_bands: int, rows_per_band: int) -> DataFrame:
    return index.select(
        "id",
        F.explode(
            lsh_band_keys(F.col("sig"), num_bands, rows_per_band)
        ).alias("band"),
    )


def incremental_minhash_dedup(
    new_docs: DataFrame,
    index: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    num_bands: int = 8,
    threshold: float = 0.5,
    seed: int = 42,
    max_band_size: Optional[int] = DEFAULT_MAX_BAND_SIZE,
    broadcast_new: bool = True,
) -> Tuple[DataFrame, DataFrame]:
    """Near-dup pairs TOUCHING the new batch + the index rows to append.

    Returns ``(pairs, new_index_rows)``: ``pairs`` is (id_a, id_b, jaccard)
    with id_a < id_b, exact-verified, where at least one side is a new
    document (old–old pairs were reported when their batches arrived);
    ``new_index_rows`` is :func:`minhash_index` of the batch, for the
    caller to append to the stored index. ``n``/``num_hashes``/``seed``
    MUST match the values the index was built with — signatures are only
    comparable under identical hashing.

    Caller contract: batch ids are disjoint from index ids (re-ingested
    documents should be dropped or deleted from the index first; an id on
    both sides would pair with itself under a different row identity).

    Scale shape: the index side is touched by (a) one map over ``sig`` for
    band keys and (b) the verify join, semi-join-pruned to candidate ids —
    the corpus's text is never re-read. With ``broadcast_new`` (default)
    the batch's band rows broadcast, so the index never shuffles either;
    disable it for batches too large to broadcast (the join falls back to
    a shuffle hash join on ``band``).

    ``max_band_size`` replays the batch operator's oversized-bucket skip
    with counts over old+new bands combined — bit-equal to the batch
    guard, at the cost of one map-side-combined aggregate over the index's
    (id, band) rows per batch. A production deployment that can't afford
    that scan should maintain per-band counts as index metadata and pass
    the hot-band list in; pass ``None`` for exact mode (no skip).
    """
    rows_per_band = num_hashes // num_bands
    new_index_rows = minhash_index(new_docs, text_col, id_col, n, num_hashes, seed)
    nb = _banded(new_index_rows, num_bands, rows_per_band)
    ab = _banded(index, num_bands, rows_per_band).unionByName(nb)
    if max_band_size is not None:
        big = (
            ab.groupBy("band")
            .agg(F.count(F.lit(1)).alias("bn"))
            .filter(F.col("bn") > max_band_size)
            .select("band")
        )
        ab = ab.join(F.broadcast(big), "band", "left_anti")
        nb = nb.join(F.broadcast(big), "band", "left_anti")
    rhs = F.broadcast(nb.alias("b")) if broadcast_new else nb.alias("b")
    cand = (
        ab.alias("a")
        .join(rhs, (F.col("a.band") == F.col("b.band")) & (F.col("a.id") != F.col("b.id")))
        .select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sh_all = index.select("id", "sh").unionByName(new_index_rows.select("id", "sh"))
    sh_a = sh_all.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    sh_b = sh_all.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    verif = cand.join(sh_a, "id_a").join(sh_b, "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("double")
    union = (F.size("sh_a") + F.size("sh_b")).cast("double") - inter
    pairs = (
        verif.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
    return pairs, new_index_rows
