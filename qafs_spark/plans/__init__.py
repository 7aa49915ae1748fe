"""Plan introspection & evidence: the scale properties this engine claims
must be *visible in the physical plan*, not asserted in prose.

The reference engine had no optimizer to inspect (SURVEY.md §4); on Spark the
plan IS the contract: filters must reach the Parquet scan (``PushedFilters``),
time bounds must prune partition directories (``PartitionFilters``), scans
must read only the projected columns (``ReadSchema``), and data-path windows
must be partitioned (no single-task ``WindowExec``). These helpers extract
that evidence from a DataFrame's query execution for tests
(tests/test_plans.py), for interactive tuning, and for BENCH/SCALE reporting.
"""

from .evidence import (
    executed_plan,
    formatted_plan,
    full_plan,
    global_window_count,
    partition_filters,
    pushed_filters,
    read_schemas,
    shuffle_count,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "full_plan",
    "pushed_filters",
    "partition_filters",
    "read_schemas",
    "shuffle_count",
    "global_window_count",
]
