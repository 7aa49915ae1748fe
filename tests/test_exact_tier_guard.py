"""Round-17 pin: the public exact all-pairs tier warns above its
documented small-corpus cap (r16 verdict "what's wrong" #3).

``embedding_dedup_pairs(use_lsh=False)`` serializes the whole corpus
through ONE applyInPandas task; internal callers cap it at
``EXACT_TIER_WARN_ROWS`` (= semdedup's exact short-circuit bound) but the
public entry had no guard — an uncapped caller silently got a
single-task quadratic kernel. The guard is a bounded probe
(``limit(cap+1).count()``, never a full count) emitting a warning; the
returned frame and every capped caller are behavior-unchanged.
"""

import warnings

import pytest
from pyspark.sql import functions as F

from qafs_spark.pipeline import dedup as dd


def _emb_df(spark, n_rows: int):
    return spark.range(n_rows).select(
        F.col("id").alias("vec_id"),
        F.array(
            (F.col("id") % 17).cast("double"),
            (F.col("id") % 5).cast("double"),
        ).alias("embedding"),
    )


def test_exact_tier_warns_above_cap(spark):
    df = _emb_df(spark, dd.EXACT_TIER_WARN_ROWS + 10)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = dd.embedding_dedup_pairs(
            df, "embedding", "vec_id", use_lsh=False
        )
    msgs = [str(w.message) for w in rec]
    assert any("exact tier scores" in m for m in msgs), msgs
    # plan construction only — the guard must not force the pair kernel
    assert out.columns == ["id_a", "id_b", "cosine"]


def test_exact_tier_quiet_at_or_below_cap(spark):
    df = _emb_df(spark, 64)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        dd.embedding_dedup_pairs(df, "embedding", "vec_id", use_lsh=False)
    assert not [w for w in rec if "exact tier" in str(w.message)]


def test_semantic_pairs_short_circuit_skips_probe(spark, monkeypatch):
    """The auto tier's short-circuit already counted the corpus — it must
    NOT pay a second probe job (pins the _known_small plumbing)."""
    from qafs_spark.pipeline import semdedup as sdd

    seen = {}
    orig = dd.embedding_dedup_pairs

    def spy(*a, **k):
        seen.update(k)
        return orig(*a, **k)

    monkeypatch.setattr(dd, "embedding_dedup_pairs", spy)
    # semdedup resolves the symbol at call time via `from .dedup import`
    # inside the function body — patch the module attr it reads
    df = _emb_df(spark, 32)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sdd.semantic_pairs(df, "embedding", "vec_id", threshold=0.9)
    assert seen.get("_known_small") is True
    assert not [w for w in rec if "exact tier" in str(w.message)]
