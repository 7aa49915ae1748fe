"""Multi-series outer alignment (+ optional grid) with forward-fill.

Reference semantics: ``ts.concat = pd.concat(dfs, join="outer", axis=1)
.ffill()`` (src/qafs/timeseries.py:12-14) — full outer join of N univariate
series on the time axis, each series carrying its last known value onto the
other series' timestamps; and the resample path's right-join back to the grid
(src/qafs/backend/pandas.py:163-172).

Spark shape: iterated full-outer equi-joins on ``time``. Every join shares the
same join key, so each input shuffles once by ``time`` and AQE coalesces the
rest; the subsequent forward-fill uses the scalable two-pass
:func:`qafs_spark.operators.ffill.ffill` (no global single-task window).
"""

from __future__ import annotations

from typing import Iterable, List, Optional, Tuple, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .ffill import AUTO, ffill

_GRID_FLAG = "__on_grid"


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
    names: List[str] = []
    aligned: Optional[DataFrame] = None
    for name, df in named_dfs:
        names.append(name)
        aligned = df if aligned is None else aligned.join(df, on=time_col, how="full")

    if grid is not None:
        g = grid.select(F.col(time_col)).withColumn(_GRID_FLAG, F.lit(True))
        aligned = g if aligned is None else aligned.join(g, on=time_col, how="full")

    if aligned is None:
        raise ValueError("align_features needs at least one series or a grid")

    if fill and names:
        aligned = ffill(aligned, names, time_col=time_col, bucket=bucket)

    if grid is not None and keep_grid_only:
        aligned = aligned.filter(F.col(_GRID_FLAG).isNotNull())
    if grid is not None:
        aligned = aligned.drop(_GRID_FLAG)
    return aligned
