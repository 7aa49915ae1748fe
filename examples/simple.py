"""Minimal end-to-end qafs_spark walkthrough (counterpart of the reference's
examples/simple.py, /root/reference/examples/simple.py — same flow, Spark
DataFrames in and out).

Run: python examples/simple.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from qafs_spark import Check, Column, FeatureStore
from qafs_spark.session import get_spark

spark = get_spark(app_name="qafs-spark-example")

fs = FeatureStore(storage=tempfile.mkdtemp(prefix="qafs_example_"), spark=spark)

fs.create_namespace("example", description="Example datasets")
fs.create_feature(
    "numbers",
    namespace="example",
    description="Timeseries of numbers",
    check=Column(int, Check.greater_than(0)),
)

dts = pd.date_range("2020-01-01", "2021-02-09")
df = spark.createDataFrame(
    pd.DataFrame({"time": dts, "example/numbers": list(range(1, len(dts) + 1))})
)
fs.save_df(df, name="numbers", namespace="example")


@fs.transform(
    "squared",
    namespace="example",
    from_features=["example/numbers"],
    check=Column(int, Check.greater_than(0)),
    returns="int",  # qafs_spark extension: declared output dtype, no inference job
)
def squared(df):
    return df["example/numbers"] ** 2


out = fs.load_features(
    ["example/numbers", "example/squared"],
    from_date="2021-01-01",
    to_date="2021-01-31",
)
rows = out.orderBy("time").collect()
print(f"{len(rows)} rows x {len(out.columns)} cols")
print(rows[0], "...", rows[-1])
