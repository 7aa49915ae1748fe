"""End-to-end corpus curation: the composed training-data pipeline.

One lazy plan chaining the standard curation stages in their canonical
order (cf. C4/Gopher/RefinedWeb-style pipelines):

1. **quality filter** — Gopher-style [0,1] score, map-only Catalyst
   expressions, rows drop at the scan;
2. **exact dedup** — keep the min-id representative per distinct content
   (md5 groupBy, map-side combined);
3. **near-dup drop** — n-gram Jaccard pairs among survivors; the greedy
   keep-lowest-id policy drops every doc that appears as the higher id of
   a qualifying pair (deterministic, SQL-replayable; full
   connected-components clustering is overkill for a drop policy);
4. **decontamination** — remove docs sharing word n-grams with the
   benchmark (broadcast eval grams, corpus never shuffled);
5. **sampling** — deterministic content-keyed hash sample down to the
   target fraction (narrow filter, nested-subset property).

Each stage consumes the previous stage's survivors, so expensive stages
(the quadratic-ish near-dup join) see an already-shrunk corpus. The whole
chain is ONE DataFrame plan — Catalyst pipelines the narrow stages into
the scan, and only dedup/near-dup shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .decontam import decontaminate
from .dedup import drop_exact_dups, ngram_jaccard_pairs
from .sampling import hash_sample
from .text import quality_table


def curate(
    docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    quality_threshold: float = 0.75,
    ngram_n: int = 3,
    jaccard_threshold: float = 0.5,
    max_doc_frac="auto",
    decontam_n: int = 4,
    min_hits: int = 1,
    sample_fraction: Optional[float] = None,
    balance_by: Optional[str] = None,
    balance_target: Optional[int] = None,
    seed: int = 42,
    cache_intermediate: bool = True,
) -> DataFrame:
    """Run the full curation chain; returns surviving rows of ``docs``.

    ``cache_intermediate`` persists the post-dedup survivor frame: the
    downstream stages (near-dup pair join, per-pair verify, decontam gram
    probe, anti-joins) each consume it in SEPARATE join branches, and
    without a materialization Spark recomputes the quality expressions +
    dedup lineage once per branch (~6 scans measured — 10× wall-clock at
    sf0.1). On a real cluster the equivalent move is writing the
    intermediate back to Parquet between stages; MEMORY_AND_DISK persist is
    the single-job analogue.
    """
    # staged quality table = ONE tokenize pass (the single-expression
    # quality_score filter re-tokenizes per signal, ~6 regex passes/row);
    # the id set joins back left-semi — same shuffle a groupBy would use.
    # The table is persisted when caching is on (round 17): the threshold
    # filter's inferred IsNotNull(quality) otherwise pushes through the
    # staged projections and re-nests the whole multi-regex quality
    # expression into the docs SCAN FILTER (the `_shingle_pair_counts`
    # re-nesting trap, found by the round-17 plan sweep — 19 expensive
    # kernels in one scan Condition); the materialization boundary stops
    # it, and the narrow (id, quality) frame is small by construction.
    qt = quality_table(docs, text_col, id_col)
    if cache_intermediate:
        from pyspark import StorageLevel as _SL

        qt = qt.persist(_SL.MEMORY_AND_DISK)
    good_ids = (
        qt.filter(F.col("quality") >= quality_threshold)
        .select(F.col("id").alias(id_col))
    )
    good = docs.join(good_ids, on=id_col, how="left_semi")
    uniq = drop_exact_dups(good, text_col, id_col)
    if cache_intermediate:
        from pyspark import StorageLevel

        uniq = uniq.persist(StorageLevel.MEMORY_AND_DISK)
    pairs = ngram_jaccard_pairs(
        uniq, text_col, id_col,
        n=ngram_n, threshold=jaccard_threshold, max_doc_frac=max_doc_frac,
    )
    dupes = pairs.select(F.col("id_b").alias(id_col)).distinct()
    neat = uniq.join(F.broadcast(dupes), on=id_col, how="left_anti")
    if benchmark is not None:
        neat = decontaminate(
            neat, benchmark, text_col, id_col, n=decontam_n, min_hits=min_hits
        )
    if sample_fraction is not None:
        neat = hash_sample(neat, id_col, sample_fraction, seed=seed)
    if balance_by is not None:
        # final mixture rebalancing (alpha=0.5 temperature over the given
        # group column): thresholds derive from the post-filter counts so
        # the balance applies to what actually survived
        from .sampling import temperature_sample

        if balance_target is None:
            raise ValueError("balance_by requires balance_target")
        neat = temperature_sample(
            neat, balance_by, id_col, balance_target, seed=seed
        )
    return neat
