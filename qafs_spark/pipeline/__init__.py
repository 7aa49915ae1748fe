"""Large-scale training-data pipeline operators (BASELINE.json north star).

Beyond reference parity, the operators a 100 TB LLM-data pipeline needs:

* :mod:`text` — tokenization, quality scoring, language-ID heuristic,
  fingerprinting. All pure `pyspark.sql.functions` column expressions —
  whole-stage codegen, no Python in the hot path.
* :mod:`dedup` — exact (hash-groupBy), MinHash+LSH, SimHash, n-gram
  Jaccard, embedding-cosine near-dup.
* :mod:`similarity` — brute-force cosine top-k baseline + hyperplane-LSH
  bucketed approximate search as the scale path.
* :mod:`multimodal` — opaque binary columns with typed metadata; decode /
  resize / frame-sample plumbing as Arrow-batched Pandas UDFs (decoders
  stubbed — codec libs are not in this container).
"""

from . import dedup, multimodal, similarity, text

__all__ = ["dedup", "multimodal", "similarity", "text"]
