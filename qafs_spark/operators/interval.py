"""Interval-containment join (points within [start, end) windows).

Spark has no native range/interval join; the naive formulation —
``points.join(intervals, (t >= start) & (t < end))`` — plans as a
BroadcastNestedLoopJoin (or worse, a cartesian) because there is no equi
key. That is O(|points| x |intervals|) and unrunnable at scale unless the
interval side is tiny.

Physical strategy here: **bin bucketing** (the classic time-binned range
join, same idea DuckDB/kdb use internally). Pick a bin width W:

* each point maps to ONE bin: ``floor(epoch(t) / W)``;
* each interval explodes to the bins it overlaps:
  ``sequence(floor(epoch(start)/W), floor(epoch(end)/W))`` — with W chosen
  near the typical interval length this is a small constant (2-3 rows);
* equi-join on ``(by..., bin)`` + the residual range predicate.

A qualifying (point, interval) pair meets in EXACTLY the point's bin (the
interval overlaps that bin by construction), so no post-join dedup is
needed. The join is a plain hash shuffle on (by, bin) — co-partitioned,
AQE-planned, skew-splittable — never a nested loop.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..offsets import parse_offset


def _bin_seconds(width: str) -> int:
    step = parse_offset(width).as_timedelta()
    secs = int(step.total_seconds())
    if secs <= 0:
        raise ValueError(f"bin width must be positive, got {width!r}")
    return secs


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    by: Optional[Sequence[str]] = None,
    bin_width: str = "1h",
    end_inclusive: bool = False,
) -> DataFrame:
    """Inner-join every point to the interval(s) containing it.

    Containment is ``start <= t < end`` (``<= end`` with end_inclusive).
    ``by`` keys must exist under the same names on both sides and join
    exactly. Output: all point columns + all interval columns (callers
    should de-collide names first). Pick ``bin_width`` near the typical
    interval length — expansion factor is ~len/width + 2 rows per interval.
    """
    by = list(by or [])
    W = _bin_seconds(bin_width)

    p = points.withColumn(
        "__bin", F.floor(F.col(point_time).cast("long") / W).cast("long")
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col).cast("long") / W).cast("long"),
                F.floor(F.col(end_col).cast("long") / W).cast("long"),
            )
        ),
    )
    t = F.col(point_time)
    residual = (t >= F.col(start_col)) & (
        t <= F.col(end_col) if end_inclusive else t < F.col(end_col)
    )
    return p.join(i, on=by + ["__bin"], how="inner").filter(residual).drop("__bin")
