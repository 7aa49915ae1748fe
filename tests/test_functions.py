"""The curated expression library (qafs_spark.functions, SURVEY §2.8): every
export is importable and the core families evaluate correctly as JVM-side
column expressions (no Python UDFs in any of them)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

import qafs_spark.functions as qf


def test_all_exports_resolve():
    for name in qf.__all__:
        assert getattr(qf, name) is not None


def test_offset_parsing_families():
    assert qf.parse_offset("15min").microseconds == 15 * 60 * 1_000_000
    assert qf.parse_offset("2d").microseconds == 2 * 86400 * 1_000_000
    assert qf.parse_offset("M").months == 1
    assert qf.parse_timedelta("-60min") == pd.Timedelta("-60min")


def test_vector_expressions(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["u", "v"]
    )
    out = df.select(
        qf.dot(F.col("u"), F.col("v")).alias("d"),
        qf.cosine(F.col("u"), F.col("v")).alias("c"),
    ).collect()
    assert out[0]["d"] == 0.0 and abs(out[0]["c"]) < 1e-12
    assert out[1]["d"] == 2.0 and abs(out[1]["c"] - 1.0) < 1e-12


def test_text_expressions(spark):
    df = spark.createDataFrame([("the quick brown fox",), ("",)], ["text"])
    rows = df.select(
        qf.token_count(F.col("text")).alias("n"),
        qf.lang_id(F.col("text")).alias("lang"),
        qf.word_shingles(F.col("text"), 2).alias("sh"),
    ).collect()
    assert rows[0]["n"] == 4 and rows[1]["n"] == 0
    assert rows[0]["lang"] == "en" and rows[1]["lang"] == "und"
    assert rows[0]["sh"] == ["the quick", "quick brown", "brown fox"]


def test_partition_expr(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"time": pd.to_datetime(["2021-03-05 10:00:00"])})
    )
    r = df.select(
        qf.partition_expr("date").alias("d"), qf.partition_expr("year").alias("y")
    ).collect()[0]
    assert r["d"] == "2021-03-05" and r["y"] == "2021"


def test_no_python_udfs_anywhere(spark):
    """Every expression in the library must stay JVM-side."""
    df = spark.createDataFrame([("hello world foo bar baz",)], ["text"])
    probe = df.select(
        qf.token_count(F.col("text")),
        qf.quality_score(F.col("text")),
        qf.simhash(F.col("text")),
        qf.minhash_signature(qf.word_shingles(F.col("text"), 3)),
        qf.rolling_hashes(F.col("text")),
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan
