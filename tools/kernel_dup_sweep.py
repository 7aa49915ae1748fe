#!/usr/bin/env python3
"""Sweep all dumpable catalog queries for duplicated expensive kernels:
count occurrences of split( / md5( / regexp_ (tokenize-class) in each
query's formatted plan. High counts = duplicated subtrees or re-nested
expressions."""
import os, sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

import __spark_entry__ as entrymod
from qafs_spark.session import get_spark

SKIP = {
    "feature_roundtrip", "rollup_roundtrip", "transform_feature",
    "feature_multi_load", "first_value", "last_value", "data_bounds",
    "stream_tumbling", "stream_sliding", "stream_incremental_dedup",
    "stream_banded_dedup", "stream_semantic_dedup", "stream_bm25_index",
    "compact_collapse", "time_travel", "lww_dedup",
}

spark = get_spark(app_name="dup-sweep")
qs = entrymod.queries()
sf = "/root/testdata/sf0.01"
mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
rows = []
for name in sorted(qs):
    if name in SKIP:
        continue
    try:
        df = qs[name](spark, sf)
        plan = df._jdf.queryExecution().explainString(mode)
    except Exception as e:
        print(f"# {name}: SKIP ({type(e).__name__})", flush=True)
        continue
    counts = {k: plan.count(k) for k in ("split(", "md5(", "regexp_")}
    rows.append((sum(counts.values()), name, counts))
rows.sort(reverse=True)
for total, name, counts in rows[:25]:
    print(f"{total:4d}  {name}  {counts}")
