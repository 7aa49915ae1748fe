"""Hybrid retrieval: reciprocal-rank fusion over the engine's ranking
operators (BM25 lexical + cosine ANN — any (id, rank) frames fuse).

RRF (Cormack et al., SIGIR'09 — the standard score-free fusion):
``score(d) = Σ_systems 1 / (rrf_k + rank_s(d))``. Score-free matters:
BM25 micro-units and cosine live on incomparable scales, but ranks
always fuse. Each contribution is frozen to an integer
(``round(1e6 / (rrf_k + rank))``) so the fused total is an exact BIGINT
sum that replays identically in SQL — and with the default ``rrf_k=60``
no per-system rank below 68 sits on a .5 rounding boundary
(1e6/(60+r) is exactly half-integral only when 60+r carries a 2^7
factor, first at 128), so any sane per-system depth is boundary-free.

Scale shape: inputs are top-N frames (already tiny — N rows per
system); the fusion is a unionByName + one groupBy over ≤ Σ N rows and
a TakeOrderedAndProject top-k. The heavy lifting happened inside the
per-system retrievers (partition-pruned probes in the persisted
indexes); fusion itself is O(candidates).
"""

from __future__ import annotations

from functools import reduce
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: List[DataFrame],
    id_col: str = "doc_id",
    k: int = 20,
    rrf_k: int = 60,
) -> DataFrame:
    """(id, rrf_micro, rank): top-k fusion of the given rankings.

    Each input needs ``id_col`` and a 1-based ``rank`` column (the output
    shape of :func:`text.bm25_topk`, :func:`similarity.brute_force_topk`
    — rename the id — and :meth:`text_index.InvertedIndex.search` /
    :meth:`vector_index.CellVectorIndex.search`). A document absent from
    a system simply contributes nothing for it. Ties in the fused score
    break on id ascending — total-order deterministic, like every
    ranking op in this package.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    contribs = [
        r.select(
            F.col(id_col).alias("id"),
            F.round(
                F.lit(1_000_000.0) / (F.lit(float(rrf_k)) + F.col("rank").cast("double"))
            )
            .cast("long")
            .alias("c"),
        )
        for r in rankings
    ]
    allc = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = allc.groupBy("id").agg(F.sum("c").alias("rrf_micro"))
    topk = fused.orderBy(F.col("rrf_micro").desc(), F.col("id").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("id").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        F.col("id").alias(id_col), "rrf_micro", "rank"
    )
