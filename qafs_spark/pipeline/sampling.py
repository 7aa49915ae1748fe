"""Deterministic, content-keyed sampling for training-data curation.

``df.sample(fraction)`` is the wrong tool for corpus curation at 100 TB: its
selection depends on partition layout and RNG stream position, so re-running
after a repartition (or on a different cluster) samples a *different* subset,
and a doc can't be traced to "in" or "out". Everything here keys the decision
on a **hash of the row's stable key** instead:

* reproducible bit-for-bit across runs, partitionings, engines (md5-derived
  arithmetic only — mirrored 1:1 in the DuckDB oracles);
* pure narrow map work — no shuffle, no RNG state, runs inside whole-stage
  codegen directly over the Parquet scan;
* composable: the same (key, seed) always lands in the same bucket, so a
  10% sample is a strict subset of the 20% sample (nested holdouts for free).

Per-group top-k (``take_per_group``) is the one shuffling operator here: one
hash shuffle by group, then a bounded per-group sort — the standard
``row_number`` pattern whose skew risk is the group key, handled by AQE.

Reference has no sampling surface; this is part of the mandated
training-data-pipeline extension set (see COVERAGE.md "Pipeline extensions").
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# One bucket ≈ 0.01% granularity; plenty for sampling rates and tiny enough
# that the modulo stays exact in 64-bit integer arithmetic.
BUCKETS = 10_000


def hash_bucket(key: Column, seed: int = 42, buckets: int = BUCKETS) -> Column:
    """Deterministic bucket in ``[0, buckets)`` from a row key.

    First 8 hex chars of ``md5(key || ':' || seed)`` as a 32-bit integer,
    mod ``buckets`` — exactly ``('0x' || substr(md5(key || ':seed'), 1, 8))
    ::BIGINT % buckets`` in ANSI-ish SQL, so an external engine can audit
    membership of any row.
    """
    salted = F.concat(key.cast("string"), F.lit(f":{seed}"))
    h32 = F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long")
    return h32 % buckets


def sql_hash_bucket(key_sql: str, seed: int = 42, buckets: int = BUCKETS) -> str:
    """DuckDB mirror of :func:`hash_bucket` (for oracles/audits)."""
    return (
        f"(('0x' || substr(md5(CAST({key_sql} AS VARCHAR) || ':{seed}'), 1, 8))"
        f"::BIGINT % {buckets})"
    )


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep rows whose bucket falls below ``fraction`` of the bucket space.

    Nested property: ``hash_sample(df, k, 0.1)`` ⊆ ``hash_sample(df, k, 0.2)``
    for the same seed. Narrow (no shuffle); the predicate is a plain Catalyst
    filter, so column pruning and scan pushdown behave as usual.
    """
    return df.filter(hash_bucket(F.col(key_col), seed) < int(fraction * BUCKETS))


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, seed: int = 42
) -> DataFrame:
    """Add a ``split`` column ("train"/"test") keyed on the row hash.

    The same key always lands on the same side — safe against duplicate keys
    leaking across the boundary *if* key identity is content identity (pair
    with the dedup operators when it isn't).
    """
    is_test = hash_bucket(F.col(key_col), seed) < int(test_fraction * BUCKETS)
    return df.withColumn("split", F.when(is_test, F.lit("test")).otherwise(F.lit("train")))


def leakage_free_split(
    df: DataFrame,
    pairs: Optional[DataFrame] = None,
    id_col: str = "doc_id",
    test_fraction: float = 0.1,
    seed: int = 42,
    k_iters: int = 3,
    converge: bool = True,
    checkpoint_dir: Optional[str] = None,
    labels: Optional[DataFrame] = None,
) -> DataFrame:
    """Train/test split with NO near-duplicate leakage across the
    boundary: (id, cluster, split) for every input row, where the split
    is keyed on the near-dup CLUSTER label, so an entire duplicate group
    lands on one side atomically.

    The op :func:`train_test_split` warns about — a plain row-hash split
    puts near-identical documents on both sides, inflating eval scores
    (the contamination mechanism the dedup literature measures). Here
    ``pairs`` (any (id_a, id_b, ...) near-dup pair frame — n-gram
    Jaccard, MinHash, SemDeDup) feeds :func:`dedup.cluster_pairs`
    min-label propagation; rows without a near-dup keep their own id as
    the cluster, reproducing the row-hash split for them. Same md5
    bucket math as :func:`hash_sample`, so membership is auditable in
    SQL and the test set nests across fractions at a fixed seed.

    Labels run in ``converge=True`` mode BY DEFAULT: a duplicate chain
    longer than ``k_iters`` hops would otherwise split into several
    labels and leak a dup pair across the boundary — the exact failure
    this operator exists to prevent. The fixed-``k_iters`` mode
    (``converge=False``) remains for SQL-replayable parity runs; on any
    graph whose components have diameter <= k_iters the two are
    bit-identical (the catalog oracle asserts this on the fixture while
    the long-chain pytest pins the divergence).

    Alternatively pass a MATERIALIZED label table via ``labels`` — any
    (id, cluster) frame, e.g. :func:`dedup.cluster_pairs_star` output
    (O(log n) rounds on long-chain graphs) or a parquet table persisted
    by an earlier pipeline stage — and the propagation here is skipped
    entirely; ``pairs`` is then not needed.

    Scale shape: label propagation is the pair graph's cost (tiny next
    to the corpus); the label join back hash-shuffles ids once; the
    split itself is a narrow map.
    """
    from .dedup import cluster_pairs

    if labels is None:
        if pairs is None:
            raise ValueError("leakage_free_split needs pairs= or labels=")
        labels = cluster_pairs(
            pairs, k_iters=k_iters, converge=converge,
            checkpoint_dir=checkpoint_dir,
        )
    else:
        labels = labels.select("id", "cluster")
    clustered = (
        df.select(F.col(id_col).alias("id"))
        .join(labels, "id", "left")
        .select(
            "id", F.coalesce(F.col("cluster"), F.col("id")).alias("cluster")
        )
    )
    is_test = hash_bucket(F.col("cluster"), seed) < int(test_fraction * BUCKETS)
    return clustered.select(
        F.col("id").alias(id_col),
        "cluster",
        F.when(is_test, F.lit("test")).otherwise(F.lit("train")).alias("split"),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    fractions: Dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. upweight rare languages).

    ``fractions`` maps stratum value → keep rate; unlisted strata use
    ``default_fraction``. Still narrow: the stratum→threshold mapping is a
    CASE expression, no join, no shuffle.
    """
    threshold = F.lit(int(default_fraction * BUCKETS))
    for value, frac in fractions.items():
        threshold = F.when(
            F.col(strata_col) == value, F.lit(int(frac * BUCKETS))
        ).otherwise(threshold)
    return df.filter(hash_bucket(F.col(key_col), seed) < threshold)


def temperature_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    target_rows: int,
    seed: int = 42,
) -> DataFrame:
    """Temperature-weighted mixture sampling (multilingual corpus balancing).

    Resamples so group shares follow ``n_g^alpha`` with **alpha = 0.5** — the
    standard temperature trick (alpha < 1 flattens the mixture toward uniform
    so rare languages/sources are upweighted; see e.g. the mBERT/XLM-R
    exponential-smoothing recipe). Expected output size ≈ ``target_rows``.

    Every step is integer-exact so the selection is bit-for-bit reproducible
    across engines (and auditable in the DuckDB oracle):

    * per-group micro-weight ``w_g = round(sqrt(n_g) * 1e6)`` — ``sqrt`` is
      IEEE-correctly-rounded in every engine (unlike ``pow(n, alpha)``, which
      is why alpha is pinned to 0.5);
    * keep-rate threshold ``t_g = min(B, (B * target * w_g) div (sum_w *
      n_g))`` in pure BIGINT arithmetic (no float summation-order hazards);
    * membership: ``hash_bucket(key) < t_g`` — same md5 bucket as every other
      sampler here, so temperature samples nest with holdouts/splits.

    Scale shape: one map-side-combined count per group (tiny), a broadcast
    of the per-group thresholds, and a narrow filter over the corpus — the
    100 TB side is never shuffled. BIGINT headroom: ``B * target * w_g``
    overflows int64 only past ~9e18 (target ~1e8 × groups of ~1e13 rows);
    cast the numerator to decimal(38,0) if you ever get there.
    """
    from pyspark import StorageLevel

    counts = (
        df.groupBy(F.col(group_col).alias("__grp"))
        .agg(F.count(F.lit(1)).alias("__n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # persist: the tiny one-row-per-group frame feeds three consumers
    # (weights, the weight total, the threshold join) — without it each
    # branch replays the full-corpus count (measured 3 corpus scans for
    # what should be 1 + the output filter's own scan)
    weights = counts.withColumn(
        "__w", F.round(F.sqrt(F.col("__n")) * F.lit(1_000_000)).cast("long")
    )
    total = weights.agg(F.sum("__w").alias("__sum_w"))
    thresholds = (
        weights.crossJoin(F.broadcast(total))
        .withColumn(
            "__thr",
            F.least(
                F.lit(BUCKETS).cast("long"),
                F.expr(
                    f"(CAST({BUCKETS} AS BIGINT) * {int(target_rows)} * __w)"
                    " div (__sum_w * __n)"
                ),
            ),
        )
        .select("__grp", "__thr")
    )
    return (
        df.join(
            F.broadcast(thresholds), df[group_col] == F.col("__grp"), "inner"
        )
        .filter(hash_bucket(F.col(key_col), seed) < F.col("__thr"))
        .drop("__grp", "__thr")
    )


def sql_temperature_thresholds(
    table: str, group_sql: str, target_rows: int, buckets: int = BUCKETS
) -> str:
    """DuckDB CTE mirroring :func:`temperature_sample`'s threshold table."""
    return f"""
    __n AS (SELECT {group_sql} AS __grp, count(*) AS __n FROM {table} GROUP BY 1),
    __w AS (SELECT __grp, __n,
                   CAST(round(sqrt(__n) * 1000000) AS BIGINT) AS __w FROM __n),
    __s AS (SELECT sum(__w) AS __sum_w FROM __w),
    __t AS (SELECT __grp,
                   least({buckets}, ({buckets}::BIGINT * {int(target_rows)} * __w)
                         // (__sum_w * __n)) AS __thr
            FROM __w, __s)
    """


def take_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    key_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Deterministic uniform-ish k rows per group ("reservoir" equivalent).

    Rank rows inside each group by their hash bucket (ties → key) and keep
    the first k. One shuffle on the group key; per-group work is a bounded
    top-k, not a full sort, once Spark applies the rank-limit pushdown
    (WindowGroupLimit in the physical plan).
    """
    w = Window.partitionBy(*group_cols).orderBy(
        hash_bucket(F.col(key_col), seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al., NeurIPS 2023)
# ---------------------------------------------------------------------------
# Select raw-corpus documents whose hashed-unigram distribution looks like a
# small TARGET corpus: score each doc by the log-likelihood ratio of its
# tokens under two hashed bucket unigram models (target vs raw), keep the
# top-k. The hashing trick (token -> md5 bucket) bounds both models at
# n_buckets cells regardless of vocabulary size, which is what makes the
# model exchange broadcast-able at 100 TB.
#
# Scale shape: two map-side-combined bucket-count aggregates (each shuffles
# at most n_buckets rows), a broadcast of the n_buckets-row log-ratio table,
# then one per-doc sum. The corpus is shuffled once (per-doc agg); no
# Python, no floats in any aggregate (log-ratios are frozen to integer
# micro-nats per bucket, per-doc sums are exact BIGINT).


def token_bucket(term: Column, n_buckets: int = 1024) -> Column:
    """md5-derived hashed-feature bucket in [0, n_buckets); mirrored in SQL
    as ``('0x' || substr(md5(term), 1, 8))::BIGINT % n_buckets`` so oracles
    and external engines reproduce membership exactly."""
    h32 = F.conv(F.substring(F.md5(term), 1, 8), 16, 10).cast("long")
    return h32 % n_buckets


def dsir_weights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-corpus-doc DSIR importance weight: ``(id, n_tokens,
    weight_micro)`` with ``weight_micro = Σ_tokens round(ln(p_target[b] /
    p_raw[b]) * 1e6)`` under add-one-smoothed hashed unigram models.

    The per-bucket log-ratio is computed as ONE natural log of one
    correctly-rounded double division — ``ln(((nt+1)·(Tr+B)) / ((nr+1)·
    (Tt+B)))`` — frozen to integer micro-nats once per bucket, so per-doc
    scores are exact integer sums (order-independent, cross-engine
    reproducible; same float discipline as text.unigram_logprob_table).
    Each factor casts to double BEFORE the multiply: at 100 TB the token
    totals reach ~1e14, so the integer product would silently wrap BIGINT
    (~9.2e18) — double products are exact to 53 bits and never overflow,
    and the oracle mirrors the same op order. Docs with zero tokens
    produce no row (explode drops them)."""
    from pyspark import StorageLevel

    from .text import tokens

    def bucket_counts(df: DataFrame, n_col: str) -> DataFrame:
        tok = df.select(F.explode(tokens(F.col(text_col))).alias("term"))
        return tok.groupBy(token_bucket(F.col("term"), n_buckets).alias("b")).agg(
            F.count(F.lit(1)).alias(n_col)
        )

    # persist both (≤ n_buckets-row) count frames: each feeds its total AND
    # the log-ratio table — without this the corpus would be tokenized three
    # times (cr total, lr join, scoring) instead of twice (model + scoring),
    # the same one-pass discipline as text.unigram_logprob_table.
    ct = bucket_counts(target, "nt").persist(StorageLevel.MEMORY_AND_DISK)
    cr = bucket_counts(corpus, "nr").persist(StorageLevel.MEMORY_AND_DISK)
    # sum() over zero rows is NULL — coalesce to 0 so an empty target (or
    # corpus) degrades to the smoothing-only uniform model instead of
    # silently nulling every weight downstream.
    tt = ct.agg(F.coalesce(F.sum("nt"), F.lit(0)).alias("tt"))
    tr = cr.agg(F.coalesce(F.sum("nr"), F.lit(0)).alias("tr"))
    B = F.lit(n_buckets).cast("long")
    lr = (
        cr.join(ct, "b", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .select(
            "b",
            F.round(
                F.log(
                    (
                        (F.coalesce(F.col("nt"), F.lit(0)) + 1).cast("double")
                        * (F.col("tr") + B).cast("double")
                    )
                    / (
                        (F.col("nr") + 1).cast("double")
                        * (F.col("tt") + B).cast("double")
                    )
                )
                * F.lit(1_000_000)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    tok_c = corpus.select(
        F.col(id_col).alias("__id"), F.explode(tokens(F.col(text_col))).alias("term")
    ).select("__id", token_bucket(F.col("term"), n_buckets).alias("b"))
    return (
        tok_c.join(F.broadcast(lr), "b")
        .groupBy("__id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_micro").alias("weight_micro"),
        )
        .select(F.col("__id").alias(id_col), "n_tokens", "weight_micro")
    )


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    k: int = 50,
) -> DataFrame:
    """Top-k corpus docs by DSIR importance weight (deterministic: ties
    break on id). ``orderBy().limit(k)`` plans as TakeOrderedAndProject —
    per-partition top-k then a k-row merge, never a global sort — and the
    rank column is assigned on the k surviving rows only (the window's
    single-partition exchange touches k rows, not the corpus)."""
    w = dsir_weights(corpus, target, text_col, id_col, n_buckets)
    order = [F.col("weight_micro").desc(), F.col(id_col).asc()]
    top = w.orderBy(*order).limit(k)
    return top.withColumn("rank", F.row_number().over(Window.orderBy(*order)))
