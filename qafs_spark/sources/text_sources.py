"""Document-corpus sources beyond Parquet: JSONL and CSV.

Training-data pipelines overwhelmingly ingest JSON-Lines (one document per
line — the interchange format of web-scrape corpora) and occasionally CSV.
These helpers wrap `spark.read` with the options that matter at 100 TB and
normalize to the `documents`-table shape the pipeline operators consume.

Scale notes:

* **Always pass a schema.** Without one Spark runs a full inference pass
  over the data (a second scan of 100 TB); with one the read is a single
  streamed scan. `DOCS_SCHEMA` matches the canonical documents table.
* **JSONL splits by line**, so a 100 TB corpus parallelizes to
  line-boundary splits for free; `.option("mode", "PERMISSIVE")` +
  `columnNameOfCorruptRecord` quarantines malformed lines into a column
  instead of failing the job (the standard dirty-web-data posture).
* **CSV needs `multiLine=false`** (the default) to stay splittable;
  multiline CSV files serialize to one task per file.
* Compressed inputs: gzip is NOT splittable (one task per .gz file —
  repack to many files or use zstd/bzip2); Parquet/ORC remain the
  preferred at-rest format — convert once with `to_parquet`.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

CORRUPT_COL = "_corrupt_record"


def read_jsonl_docs(
    spark: SparkSession,
    path: str,
    schema: Optional[T.StructType] = None,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Read a JSON-Lines document corpus into the documents-table shape.

    Malformed lines land in ``_corrupt_record`` (PERMISSIVE mode); by
    default they are dropped and the column removed — pass
    ``keep_corrupt=True`` to quarantine them for inspection instead
    (note: Spark refuses queries that reference ONLY the corrupt column on
    a raw JSON scan — ``.cache()`` the frame first, per the Spark docs).
    """
    schema = schema or DOCS_SCHEMA
    if keep_corrupt:
        read_schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
        return (
            spark.read.schema(read_schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    # DROPMALFORMED skips bad lines inside the scan itself — no corrupt
    # column, so downstream count()/pruned projections avoid Spark's
    # corrupt-column-only query restriction entirely
    return (
        spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)
    )


def read_csv_docs(
    spark: SparkSession,
    path: str,
    schema: Optional[T.StructType] = None,
    header: bool = True,
) -> DataFrame:
    """Read a CSV document corpus (splittable single-line records)."""
    return (
        spark.read.schema(schema or DOCS_SCHEMA)
        .option("header", str(header).lower())
        .option("multiLine", "false")
        .option("mode", "DROPMALFORMED")
        .csv(path)
    )


def to_parquet(df: DataFrame, path: str, partitions: Optional[int] = None) -> None:
    """One-time conversion to the at-rest format: text sources are scanned
    once, then every downstream op reads columnar Parquet with pushdown."""
    out = df.repartition(partitions) if partitions else df
    out.write.mode("overwrite").parquet(path)
