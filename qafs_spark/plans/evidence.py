"""Extract scale-relevant evidence from a DataFrame's physical plan.

All helpers are read-only over ``df._jdf.queryExecution()`` — they trigger
planning (analysis + optimization + physical planning) but never execute a
job, so they are safe to call on plans over 100 TB tables.
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical (executed) plan as text — what actually runs."""
    return df._jdf.queryExecution().executedPlan().toString()


def full_plan(df: DataFrame) -> str:
    """All four plan stages (parsed/analyzed/optimized/physical) as text."""
    return df._jdf.queryExecution().toString()


def formatted_plan(df: DataFrame) -> str:
    """``explain("formatted")`` as a string — one line per scan annotation,
    untruncated (the simple plan string elides long ``PushedFilters`` with
    ``...``). This is the string that carries ``PushedFilters`` /
    ``PartitionFilters`` / ``ReadSchema`` reliably.
    """
    spark = df.sparkSession
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def _scan_annotations(df: DataFrame, key: str) -> List[str]:
    # In formatted mode each file scan prints `Key: [a, b, ...]` (or
    # `ReadSchema: struct<...>`) on its own line.
    out: List[str] = []
    for line in formatted_plan(df).splitlines():
        m = re.match(rf"\s*{key}: (.*)$", line)
        if m:
            out.append(m.group(1).strip().strip("[]"))
    return out


def pushed_filters(df: DataFrame) -> List[str]:
    """Filters pushed into the Parquet reader (row-group/page skipping).

    One ``"f1, f2, ..."`` string per file scan in the plan. A time-ranged
    feature read must show ``GreaterThanOrEqual(time,...)`` /
    ``LessThanOrEqual(time,...)`` here — if the filter only appears in a
    post-scan ``Filter`` node, the scan reads every row group.
    """
    return _scan_annotations(df, "PushedFilters")


def partition_filters(df: DataFrame) -> List[str]:
    """Static partition-directory pruning predicates per file scan.

    The derived ``partition >=/<=`` predicates added at plan-build time
    (sources/feature_dataset.py) must land here — that is what turns a
    100 TB directory walk into a few-partition read.
    """
    return _scan_annotations(df, "PartitionFilters")


def read_schemas(df: DataFrame) -> List[str]:
    """``ReadSchema`` per file scan — the columns actually read.

    Column pruning evidence: a 2-column projection over a wide table must
    show only those columns here.
    """
    return _scan_annotations(df, "ReadSchema")


def shuffle_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan.

    Counts ``Exchange``/``ShuffleExchange`` operators (excluding reused
    exchanges and broadcast exchanges — broadcasts ship a small table, not
    the data path). Every unit here is a full materialize-and-repartition of
    its input at scale; operators advertised as "one shuffle" are held to it
    in tests.
    """
    plan = executed_plan(df)
    shuffles = len(re.findall(r"\bExchange (?:hash|range|Single)", plan))
    return shuffles


def global_window_count(df: DataFrame) -> int:
    """Number of *unpartitioned* Window operators in the physical plan.

    An unpartitioned window funnels all rows through one task. Data-path
    operators must keep this at zero over row-scale inputs; the two-pass
    ffill is allowed one — over its one-row-per-bucket aggregate
    (operators/ffill.py pass 2), where "all rows" is #buckets.
    """
    count = 0
    for line in executed_plan(df).splitlines():
        # Inside `windowspecdefinition(part..., order..., frame)` partition
        # columns print bare while order columns carry ASC/DESC markers, so
        # a spec whose every pre-frame argument is an ordering (or that has
        # none) is unpartitioned. (Counting bracket groups is wrong: a
        # partitioned-but-UNORDERED window — e.g. collect_set over the
        # whole partition — prints only two groups and is NOT global.)
        if "Window" in line:
            m = re.search(
                r"windowspecdefinition\((.*?)specifiedwindowframe", line
            )
            if m:
                args = [a.strip() for a in m.group(1).rstrip(", ").split(",")]
                args = [a for a in args if a]
                if not args or all(
                    " ASC" in a or " DESC" in a for a in args
                ):
                    count += 1
        m = re.search(r"\bWindowGroupLimit\s+\[([^\]]*)\]", line)
        if m and m.group(1).strip() == "":
            count += 1
    return count
