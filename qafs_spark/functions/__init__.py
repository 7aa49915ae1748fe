"""The engine's scalar/array expression library (SURVEY.md §2.8).

One import surface for every reusable Column expression the engine is built
from. Everything here is a **JVM-side Catalyst expression** — no Python UDFs —
so each helper composes into whole-stage codegen wherever it is used.

Organized by family (home modules in parentheses; these are re-exports, the
implementations live next to the operator that owns the semantics):

* temporal (``qafs_spark.offsets``, ``operators/resample.py``): pandas
  offset-alias parsing (``"15min"``, ``"2d"``, ``"M"``) onto Spark's interval
  families, signed timedelta shifts (time travel), and `sequence`-based
  time-grid generation (reference semantics: src/qafs/backend/pandas.py:130,
  :165).
* partitioning (``sources/feature_dataset.py``): time → partition-key
  derivation (reference: src/qafs/backend/pandas.py:62-70).
* vector (``pipeline/similarity.py``): dot / norm / cosine over
  ``array<float>`` embedding columns via ``zip_with`` + ``aggregate``.
* text (``pipeline/text.py``, ``pipeline/dedup.py``): tokenization, counts,
  quality/ratio metrics, language scores, shingling, minhash signatures,
  rolling-hash fingerprints.
"""

from ..offsets import Freq, parse_offset, parse_timedelta, shift
from ..operators.resample import n_steps, time_grid
from ..pipeline.dedup import (
    minhash_signature,
    minhash_signature_from_hashes,
    shingle_hashes,
    simhash,
    word_shingles,
)
from ..pipeline.similarity import cosine, dot, norm
from ..pipeline.text import (
    bpe_ish_token_count,
    char_count,
    fingerprint_md5,
    lang_id,
    lang_scores,
    mean_word_length,
    punct_ratio,
    quality_score,
    rolling_hashes,
    stopword_count,
    stopword_ratio,
    token_count,
    tokens,
    winnowing_fingerprint,
)
from ..sources.feature_dataset import partition_expr

__all__ = [
    # temporal
    "Freq",
    "parse_offset",
    "parse_timedelta",
    "shift",
    "time_grid",
    "n_steps",
    # partitioning
    "partition_expr",
    # vector
    "dot",
    "norm",
    "cosine",
    # text
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "char_count",
    "punct_ratio",
    "stopword_count",
    "stopword_ratio",
    "mean_word_length",
    "quality_score",
    "lang_scores",
    "lang_id",
    "fingerprint_md5",
    "rolling_hashes",
    "winnowing_fingerprint",
    "word_shingles",
    "shingle_hashes",
    "minhash_signature",
    "minhash_signature_from_hashes",
    "simhash",
]
