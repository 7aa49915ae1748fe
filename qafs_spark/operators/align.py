"""Multi-series outer alignment (+ optional grid) with forward-fill.

Reference semantics: ``ts.concat = pd.concat(dfs, join="outer", axis=1)
.ffill()`` (src/qafs/timeseries.py:12-14) — full outer join of N univariate
series on the time axis, each series carrying its last known value onto the
other series' timestamps; and the resample path's right-join back to the grid
(src/qafs/backend/pandas.py:163-172).

Spark shape: **one shuffle regardless of N**. Instead of N-1 iterated
full-outer joins (each a separate Exchange on ``time``), all series union
into a tall (time, series, value) frame — union is shuffle-free — and a
single ``groupBy(time)`` conditional aggregation pivots them back to one
column per series: ``max(when(series = name, value))`` picks the series'
(unique) value at each timestamp. Series whose value types differ can't
share one union column, so they aggregate per type-group (one shuffle per
distinct value type — in practice one) and the handful of per-type results
join full-outer; AQE coalesces those tiny joins. The subsequent forward-fill
uses the scalable two-pass :func:`qafs_spark.operators.ffill.ffill` (no
global single-task window).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ffill import AUTO, ffill

_GRID_FLAG = "__on_grid"
_GRID_SERIES = "__grid__"


def _pivot_group(
    items: List[Tuple[str, DataFrame]],
    time_col: str,
    grid: Optional[DataFrame],
) -> DataFrame:
    """Union the (name, df) series tall and pivot back via conditional agg.

    If ``grid`` is given its timestamps ride along in the same union as a
    sentinel series, so the grid membership flag costs no extra shuffle.
    """
    tall: Optional[DataFrame] = None
    for name, df in items:
        row = df.select(
            F.col(time_col),
            F.lit(name).alias("__series"),
            F.col(name).alias("__value"),
        )
        tall = row if tall is None else tall.unionByName(row)
    if grid is not None:
        value_type = tall.schema["__value"].dataType.simpleString()
        g = grid.select(
            F.col(time_col),
            F.lit(_GRID_SERIES).alias("__series"),
            F.lit(None).cast(value_type).alias("__value"),
        )
        tall = tall.unionByName(g)
    aggs = [
        F.max(
            F.when(F.col("__series") == F.lit(name), F.col("__value"))
        ).alias(name)
        for name, _ in items
    ]
    if grid is not None:
        aggs.append(
            F.max(
                F.when(F.col("__series") == F.lit(_GRID_SERIES), F.lit(True))
            ).alias(_GRID_FLAG)
        )
    return tall.groupBy(time_col).agg(*aggs)


def align_features(
    named_dfs: Iterable[Tuple[str, DataFrame]],
    time_col: str = "time",
    grid: Optional[DataFrame] = None,
    fill: bool = True,
    keep_grid_only: bool = False,
    bucket: Union[str, Column, None] = AUTO,
) -> DataFrame:
    """Outer-align ``(name, df)`` series on ``time_col`` and forward-fill.

    Each input df must have exactly the columns ``(time_col, name)`` with
    unique timestamps (run last-write-wins dedup first). If ``grid`` is given
    its timestamps join into the timeline; with ``keep_grid_only`` the result
    is restricted to grid rows *after* filling — i.e. an as-of join of every
    series onto the grid.
    """
    named = list(named_dfs)
    names: List[str] = [name for name, _ in named]

    # Partition series by value type: each type-group unions into one tall
    # frame → one Exchange; different types can't share a union column.
    groups: dict = {}
    for name, df in named:
        key = df.schema[name].dataType.simpleString()
        groups.setdefault(key, []).append((name, df))

    aligned: Optional[DataFrame] = None
    grid_pending = grid
    for items in groups.values():
        part = _pivot_group(items, time_col, grid_pending)
        grid_pending = None  # the flag rides with the first group only
        aligned = (
            part
            if aligned is None
            else aligned.join(part, on=time_col, how="full")
        )

    if grid_pending is not None:  # no series at all: grid-only timeline
        aligned = grid_pending.select(F.col(time_col)).withColumn(
            _GRID_FLAG, F.lit(True)
        )

    if aligned is None:
        raise ValueError("align_features needs at least one series or a grid")

    if grid is not None:
        # outer-joined type-groups can leave the flag null on non-first-group
        # rows; membership is "flag is true"
        aligned = aligned.withColumn(
            _GRID_FLAG, F.col(_GRID_FLAG).isNotNull() & F.col(_GRID_FLAG)
        )

    if fill and names:
        aligned = ffill(aligned, names, time_col=time_col, bucket=bucket)

    if grid is not None and keep_grid_only:
        aligned = aligned.filter(F.col(_GRID_FLAG))
    if grid is not None:
        aligned = aligned.drop(_GRID_FLAG)
    return aligned
