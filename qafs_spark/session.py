"""SparkSession factory with scale-sane defaults.

Local testing runs ``local[N]``; the same settings are the ones you'd want on
a 1000-executor cluster: AQE on (runtime re-planning, skew-join splitting,
partition coalescing), UTC session timezone (timestamps round-trip exactly
against Parquet/DuckDB/pandas), Arrow transfers for the Pandas-UDF surface,
and partition-type inference off so Hive `partition=` directory keys stay
strings (our derived-pruning predicates compare strings).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "qafs-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "snappy")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # InferFiltersFromGenerate re-derives `size(arr)>0 AND isnotnull(arr)`
        # below every explode and predicate-pushdown then substitutes the
        # array's FULL defining expression into the filter. Our explodes are
        # over staged expensive arrays (shingle hashes, LSH band keys), where
        # that inferred filter recomputes the array once more per row —
        # measured ~10× slowdown on the dedup family. The rule only helps
        # when exploding raw source columns, which we never do.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
