"""Pandas offset-alias strings → Spark intervals.

The reference exposes every time knob as a pandas-style string: resample
``freq="2d"|"10min"`` (reference: src/qafs/backend/pandas.py:165), time travel
``"-15min"`` (reference: src/qafs/backend/pandas.py:130). This module is the
faithful translator onto Spark's two interval families:

* fixed-duration offsets (``d``/``h``/``min``/``s``/...) → DayTimeInterval
  (exact microsecond arithmetic),
* calendar offsets (``M``/``Q``/``Y``) → YearMonthInterval months evaluated
  by Spark's calendar-aware timestamp arithmetic,
* anchored offsets ("M"/"ME" = month *end*, "MS" = month start, "Q"/"Y"
  likewise, "W"/"W-SUN"/"W-MON" = weekly on a weekday) carry their pandas
  DateOffset so grids SNAP exactly like ``pd.date_range``: the first grid
  point is ``offset.rollforward(from_date)`` (time-of-day preserved), and
  month-end steps re-snap to each month's last day. Weekly anchors reduce
  to a fixed 7-day period once the start is rolled — only the anchor
  moves. Plain durations like "1w"/"7d" remain unanchored fixed periods.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from .exceptions import FeatureStoreException


@dataclass(frozen=True)
class Freq:
    """A parsed offset: exactly one of (months, microseconds) is nonzero.

    ``anchored`` is "" (unanchored), "month_end", "month_begin", or
    "week"; anchored freqs keep the originating pandas offset (excluded
    from equality) so :meth:`anchor_start` can roll a range start onto
    the anchor exactly like ``pd.date_range`` does."""

    months: int = 0
    microseconds: int = 0
    anchored: str = ""
    pd_offset: object = field(default=None, compare=False, repr=False)

    @property
    def is_calendar(self) -> bool:
        return self.months != 0

    def anchor_start(self, ts: pd.Timestamp) -> pd.Timestamp:
        """First grid point at-or-after ``ts``: ``ts`` itself when on the
        anchor (or unanchored), else rolled forward with time-of-day
        preserved — ``pd.date_range``'s start handling."""
        if not self.anchored:
            return ts
        return pd.Timestamp(self.pd_offset.rollforward(ts))

    def calendar_point(self, start: pd.Timestamp, k: int) -> pd.Timestamp:
        """Driver-side grid point k for calendar freqs: ``start`` (already
        anchored) plus k steps, re-snapped to month end when anchored
        there (a 28-day February start must not drag March to the 28th)."""
        t = start + pd.DateOffset(months=self.months * k)
        if self.anchored == "month_end":
            t = t + pd.offsets.MonthEnd(0)
        return pd.Timestamp(t)

    def interval_sql(self) -> str:
        """Spark SQL interval literal usable as a `sequence()` step."""
        if self.months:
            return f"INTERVAL '{self.months}' MONTH"
        if self.microseconds % 1_000_000 == 0:
            return f"INTERVAL '{self.microseconds // 1_000_000}' SECOND"
        return f"make_dt_interval(0, 0, 0, {self.microseconds / 1_000_000!r})"

    def step_expr(self) -> Column:
        if self.months:
            return F.expr(f"INTERVAL '{self.months}' MONTH")
        if self.microseconds % 1_000_000 == 0:
            return F.expr(f"INTERVAL '{self.microseconds // 1_000_000}' SECOND")
        return F.expr(f"make_dt_interval(0, 0, 0, {self.microseconds / 1_000_000!r})")

    def as_timedelta(self) -> pd.Timedelta:
        if self.months:
            raise FeatureStoreException("calendar offset has no fixed duration")
        return pd.Timedelta(self.microseconds, unit="us")


def parse_offset(freq: str) -> Freq:
    """Parse a pandas offset alias ("10min", "2d", "1w", "M", "3M", "Y")."""
    if isinstance(freq, Freq):
        return freq
    try:
        td = pd.Timedelta(freq)
        return Freq(microseconds=_td_us(td))
    except ValueError:
        pass
    try:
        import warnings

        with warnings.catch_warnings():
            # pandas 2.2 deprecates 'M'/'Y' in favour of 'ME'/'YE'; the
            # reference API accepts the short aliases, so keep accepting
            # them quietly and normalize for future pandas.
            warnings.simplefilter("ignore", FutureWarning)
            try:
                off = pd.tseries.frequencies.to_offset(freq)
            except ValueError:
                alias = {"M": "ME", "Y": "YE", "Q": "QE"}
                m = re.fullmatch(r"(\d*)([MQY])", freq.strip())
                if not m:
                    raise
                off = pd.tseries.frequencies.to_offset(
                    (m.group(1) or "") + alias[m.group(2)]
                )
    except ValueError as exc:
        raise FeatureStoreException(f"Cannot parse offset {freq!r}") from exc
    n = off.n
    name = type(off).__name__
    months_of = {"Month": 1, "Quarter": 3, "Year": 12}
    if name == "Week":
        us = n * 7 * 86_400_000_000
        if getattr(off, "weekday", None) is None:
            return Freq(microseconds=us)
        return Freq(microseconds=us, anchored="week", pd_offset=off)
    for stem, mpern in months_of.items():
        if name == stem + "End":
            return Freq(months=mpern * n, anchored="month_end", pd_offset=off)
        if name == stem + "Begin":
            return Freq(months=mpern * n, anchored="month_begin", pd_offset=off)
    try:  # Day/Hour/Minute/... Ticks expose .delta
        return Freq(microseconds=_td_us(pd.Timedelta(off)))
    except (ValueError, TypeError) as exc:
        raise FeatureStoreException(f"Unsupported offset {freq!r}") from exc


def parse_timedelta(delta: str) -> pd.Timedelta:
    """Parse a signed *fixed* timedelta string (time-travel deltas: "-15min").

    Reference semantics: src/qafs/backend/pandas.py:130 uses
    ``pd.Timedelta(time_travel)`` directly, so calendar units are invalid here.
    """
    try:
        return pd.Timedelta(delta)
    except ValueError as exc:
        raise FeatureStoreException(
            f"time_travel must be a fixed timedelta string, got {delta!r}"
        ) from exc


def shift(col: Column, delta: pd.Timedelta) -> Column:
    """``col + delta`` with exact microsecond arithmetic on TimestampType."""
    us = _td_us(delta)
    if us % 1_000_000 == 0:
        return col + F.expr(f"INTERVAL '{us // 1_000_000}' SECOND")
    return col + F.expr(f"make_dt_interval(0, 0, 0, {us / 1_000_000!r})")


def _td_us(td: pd.Timedelta) -> int:
    return td.value // 1000  # pandas Timedelta.value is nanoseconds
