"""Time travel: as-of-creation filtering.

Reference semantics (src/qafs/backend/pandas.py:127-131, tests:451-492): keep
rows where ``created_time <= time + delta`` for a signed fixed timedelta
string (e.g. ``"-15min"``) — "what was known at time+delta". Combined with
last-write-wins dedup downstream this reconstructs the store's state as of
any offset from event time.

Pure row filter → Catalyst pushes it into the scan where possible; no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..offsets import parse_timedelta, shift


def time_travel_filter(
    df: DataFrame,
    delta: str,
    time_col: str = "time",
    created_col: str = "created_time",
) -> DataFrame:
    td = parse_timedelta(delta)
    return df.filter(F.col(created_col) <= shift(F.col(time_col), td))
