"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship end-to-end feature-store pipeline on
sf0.001; ``queries()``/``oracle_sql()`` expose the full declared catalog from
``qafs_spark.queries`` — every operator from SURVEY.md §2 plus the pipeline
extensions, each with an exactly-equivalent DuckDB oracle. As of round 10
EVERY catalog entry has an oracle: the approximate ANN tiers
(``lsh_ann_topk`` / ``ivf_ann_topk``) replay their deterministic candidate
generation (seeded hyperplane literals / md5-seeded quantizer) in DuckDB
SQL; recall vs the exact tier stays certified by the ``lsh_ann_recall`` /
``ivf_ann_recall`` companion rows and recall tests in tests/.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from qafs_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full feature-store round trip (ingest → partitioned parquet
    → registry → load with LWW dedup + as-of daily resample) on sf0.001."""
    return _q.QUERIES["feature_roundtrip"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_q.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_q.ORACLES)
