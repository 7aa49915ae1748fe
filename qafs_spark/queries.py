"""Declared query catalog: every operator from SURVEY.md §2 + the pipeline
extensions, each as (a) a Spark DataFrame builder over the testdata tables
and (b) an exactly-equivalent ANSI-SQL oracle for DuckDB.

Cross-engine determinism rules used throughout (the reason results
hash-match bit-for-bit):

* money/double sums → integer **cents** before aggregation
  (``CAST(round(x*100) AS BIGINT)``): double accumulation order differs
  between engines, integer sums don't;
* quantities (integral doubles) sum exactly in double — safe as-is;
* all hashing is md5-derived integer arithmetic (``('0x'||substr(md5(s),1,8))
  ::BIGINT`` ≡ ``conv(substring(md5(s),1,8),16,10)``) — no engine-private
  hash functions;
* cosines / float ratios are rounded (6 dp) where they appear as values;
  ranking tiebreaks are always (score DESC, id ASC);
* float-compare tolerance contract: cosine flows through two summation
  orders — the JVM expression path (``similarity.cosine_pre``, a
  sequential left fold, which DuckDB's ``list_sum`` replays) and the
  Arrow path (``cosine_pre_batch``, numpy einsum's blocked reduction,
  used on pair-join hot paths). Both promote to float64 first; the
  deviation is bounded by reduction-order rounding (measured ≤4e-16 on a
  2M-pair fixture, zero 1e-6 flips). Any query whose oracle compares a
  RAW float (not an integer-frozen or 6-dp-rounded value) must use the
  expression path; einsum-scored paths may only feed rounded/frozen
  compares — a value within ~1e-15 of a 6-dp rounding boundary or of a
  threshold could legitimately differ, which the fixtures don't contain
  (they would be regenerated, not worked around, if one ever did);
* the same tie-distance rule covers candidate **membership** decisions in
  the two ANN oracles (``lsh_ann_topk`` sign bits; ``ivf_ann_topk``
  argmax-cell assignment and probe-cell ranking): Spark computes them via
  numpy einsum (fixed-order float64 reduction), DuckDB replays them as
  ``list_sum`` folds — different summation orders, not bit-equal. A flip
  needs two cell/plane cosines within ~1e-15 of each other (or a dot
  within ~1e-15 of zero) on md5-seeded continuous-valued fixtures, which
  is the same measure-zero class as the value-compare hazard above and
  carries the same policy: if a regenerated fixture ever lands on such a
  tie, regenerate the fixture (the catalog does not add per-query
  epsilon fudge to candidate selection);
* every aggregate/computed column is aliased identically on both sides.

The events table doubles as the feature-store fixture: ``time`` =
hour-truncated ``ts`` (duplicate times → last-write-wins is meaningful),
``created_time`` = ``ts + (event_id % 7) minutes`` (deterministic ingest
delay → time travel is meaningful).
"""

from __future__ import annotations

from typing import Callable, Dict

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import last_write_wins, resample_asof, time_travel_filter
from .operators.align import align_features
from .pipeline import decontam as dc
from .pipeline import dedup as dd
from .pipeline import incremental as inc
from .pipeline import sampling as sp
from .pipeline import semdedup as sdd
from .pipeline import similarity as sim
from .pipeline import text as tx

QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: Dict[str, str] = {}


def register(name: str, oracle: str = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if table == "events":
        # events.ts is physical TIMESTAMP(NANOS); the scan surfaces it
        # differently per Spark version. sources/events.py is the single
        # place that normalizes it — batch and streaming alike.
        from .sources.events import read_events

        return read_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def cents(col) -> F.Column:
    """Deterministic money aggregation: double → integer cents."""
    return F.round(col * 100).cast("long")


# SQL fragment mirrors of the helpers above
_SQL_CENTS = "CAST(round({x} * 100) AS BIGINT)"


def _event_series_df(spark, sf_dir) -> DataFrame:
    """events → feature-store shaped series (time, created_time, value,
    event_id): hour-truncated time + deterministic ingest delay."""
    return _t(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("time"),
        (F.col("ts") + F.make_interval(mins=(F.col("event_id") % 7).cast("int"))).alias(
            "created_time"
        ),
        F.col("value"),
        F.col("event_id"),
    )


_SQL_EVENT_SERIES = """
    SELECT date_trunc('hour', ts) AS time,
           ts + (event_id % 7) * INTERVAL 1 MINUTE AS created_time,
           value, event_id
    FROM events
"""

_SQL_LWW = f"""
    SELECT time, value FROM (
        SELECT time, value,
               row_number() OVER (
                   PARTITION BY time
                   ORDER BY created_time DESC, event_id DESC
               ) AS rn
        FROM ({_SQL_EVENT_SERIES})
    ) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# J3/A1/W2/O1 — last-write-wins dedup
# ---------------------------------------------------------------------------
@register("lww_dedup", oracle=_SQL_LWW)
def q_lww_dedup(spark, sf_dir):
    """SURVEY §2 J3: upsert-over-append-only (reference pandas.py:160-161)."""
    return last_write_wins(
        _event_series_df(spark, sf_dir),
        value_cols=["value"],
        tiebreak_cols=["event_id"],
    ).select("time", "value")


# ---------------------------------------------------------------------------
# P2 — time travel
# ---------------------------------------------------------------------------
@register(
    "time_travel",
    oracle=f"""
    SELECT time, value FROM (
        SELECT time, value,
               row_number() OVER (
                   PARTITION BY time
                   ORDER BY created_time DESC, event_id DESC
               ) AS rn
        FROM ({_SQL_EVENT_SERIES})
        WHERE created_time <= time + INTERVAL 30 MINUTE
    ) WHERE rn = 1
    """,
)
def q_time_travel(spark, sf_dir):
    """SURVEY §2 P2 (reference pandas.py:127-131): state as known at
    time+30min, then last-write-wins."""
    filtered = time_travel_filter(_event_series_df(spark, sf_dir), "30min")
    return last_write_wins(
        filtered, value_cols=["value"], tiebreak_cols=["event_id"]
    ).select("time", "value")


# ---------------------------------------------------------------------------
# J2 — resample-to-grid as-of (the golden semantics)
# ---------------------------------------------------------------------------
_RESAMPLE_FROM = "2024-01-05 00:00:00"
_RESAMPLE_TO = "2024-01-25 00:00:00"
_RESAMPLE_STEP_S = 6 * 3600
_RESAMPLE_KMAX = 80  # 20 days / 6h


@register(
    "resample_asof",
    oracle=f"""
    WITH series AS ({_SQL_LWW}),
    binned AS (
        SELECT CAST(ceil((epoch(time) - epoch(TIMESTAMP '{_RESAMPLE_FROM}'))
                    / {_RESAMPLE_STEP_S}.0) AS BIGINT) AS k,
               arg_max(value, time) AS value
        FROM series
        WHERE time <= TIMESTAMP '{_RESAMPLE_TO}'
        GROUP BY 1
    ),
    grid AS (SELECT CAST(unnest(range(0, {_RESAMPLE_KMAX + 1})) AS BIGINT) AS k),
    allk AS (SELECT k FROM grid UNION SELECT k FROM binned),
    filled AS (
        SELECT a.k,
               last_value(b.value IGNORE NULLS) OVER (
                   ORDER BY a.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value
        FROM allk a LEFT JOIN binned b USING (k)
    )
    SELECT TIMESTAMP '{_RESAMPLE_FROM}' + k * INTERVAL 6 HOUR AS time, value
    FROM filled WHERE k BETWEEN 0 AND {_RESAMPLE_KMAX}
    """,
)
def q_resample_asof(spark, sf_dir):
    """SURVEY §2 J2 (reference pandas.py:163-172 + golden tests:348-362):
    6h grid over [01-05, 01-25], carry-in from history through the bin chain."""
    series = last_write_wins(
        _event_series_df(spark, sf_dir).filter(
            F.col("time") <= F.lit(pd.Timestamp(_RESAMPLE_TO))
        ),
        value_cols=["value"],
        tiebreak_cols=["event_id"],
    )
    return resample_asof(
        series.select("time", "value"),
        ["value"],
        pd.Timestamp(_RESAMPLE_FROM),
        pd.Timestamp(_RESAMPLE_TO),
        "6h",
    )


# ---------------------------------------------------------------------------
# J2b — ANCHORED calendar resample ("M" = month ends, pd.date_range parity)
# ---------------------------------------------------------------------------
_ANCH_FROM = "1995-01-15 00:00:00"
_ANCH_G0 = "1995-01-31 00:00:00"  # rollforward(_ANCH_FROM) onto month ends
_ANCH_TO = "1995-12-10 00:00:00"
_ANCH_KMAX = 10  # Jan 31 (k=0) .. Nov 30 (k=10) <= _ANCH_TO


@register(
    "resample_anchored_month",
    oracle=f"""
    WITH series AS (
        SELECT date_trunc('day', o_orderdate) AS time,
               CAST(sum({_SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS orders_cents
        FROM orders GROUP BY 1
    ),
    binned AS (
        SELECT (year(time) * 12 + month(time))
                 - (year(TIMESTAMP '{_ANCH_G0}') * 12
                    + month(TIMESTAMP '{_ANCH_G0}'))
                 + CASE WHEN time > CAST(last_day(CAST(time AS DATE)) AS TIMESTAMP)
                        THEN 1 ELSE 0 END AS k,
               arg_max(orders_cents, time) AS orders_cents
        FROM series
        WHERE time <= TIMESTAMP '{_ANCH_TO}'
        GROUP BY 1
    ),
    grid AS (SELECT CAST(unnest(range(0, {_ANCH_KMAX + 1})) AS BIGINT) AS k),
    allk AS (SELECT k FROM grid UNION SELECT k FROM binned),
    filled AS (
        SELECT a.k,
               last_value(b.orders_cents IGNORE NULLS) OVER (
                   ORDER BY a.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS orders_cents
        FROM allk a LEFT JOIN binned b USING (k)
    )
    SELECT CAST(last_day(CAST(TIMESTAMP '{_ANCH_G0}'
                 + to_months(CAST(k AS INT)) AS DATE)) AS TIMESTAMP) AS time,
           orders_cents
    FROM filled WHERE k BETWEEN 0 AND {_ANCH_KMAX}
    """,
)
def q_resample_anchored_month(spark, sf_dir):
    """ANCHORED calendar resample: freq="M" means month-END grid points
    rolled forward from from_date with per-step last-day re-snapping —
    ``pd.date_range``/``resample("ME")`` parity (reference resamples via
    pandas, src/qafs/backend/pandas.py:163-172, so anchored aliases are
    part of its accepted freq surface). Daily order revenue resampled
    onto the 11 month-ends of 1995 inside [01-15, 12-10], history before
    the window carrying in through the bin chain."""
    series = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("time"))
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("orders_cents"))
        .filter(F.col("time") <= F.lit(pd.Timestamp(_ANCH_TO)))
    )
    return resample_asof(
        series,
        ["orders_cents"],
        pd.Timestamp(_ANCH_FROM),
        pd.Timestamp(_ANCH_TO),
        "M",
    )


@register(
    "resample_downsample_month",
    oracle=f"""
    WITH series AS (
        SELECT date_trunc('day', o_orderdate) AS time,
               CAST(sum({_SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS v
        FROM orders GROUP BY 1
    ),
    binned AS (
        SELECT (year(time) * 12 + month(time))
                 - (year(TIMESTAMP '{_ANCH_G0}') * 12
                    + month(TIMESTAMP '{_ANCH_G0}'))
                 - CASE WHEN time < CAST(last_day(CAST(time AS DATE)) AS TIMESTAMP)
                        THEN 1 ELSE 0 END AS k,
               CAST(sum(v) AS BIGINT) AS orders_sum_cents,
               count(v) AS orders_days
        FROM series
        WHERE time >= TIMESTAMP '{_ANCH_G0}'
          AND time < TIMESTAMP '1995-12-31 00:00:00'
        GROUP BY 1
    ),
    grid AS (SELECT CAST(unnest(range(0, {_ANCH_KMAX + 1})) AS BIGINT) AS k)
    SELECT CAST(last_day(CAST(TIMESTAMP '{_ANCH_G0}'
                 + to_months(CAST(k AS INT)) AS DATE)) AS TIMESTAMP) AS time,
           b.orders_sum_cents,
           COALESCE(b.orders_days, 0) AS orders_days
    FROM grid g LEFT JOIN binned b USING (k)
    """,
)
def q_resample_downsample_month(spark, sf_dir):
    """ANCHORED downsample: per-bin aggregates onto the month-END grid —
    pandas ``resample("ME", closed="left", label="left").agg(...)``
    semantics with the grid rolled forward from from_date (pd.date_range
    parity). Bins are [g_k, g_{k+1}) over the 11 month-ends of 1995;
    sum stays in integer cents and count coalesces to 0 on empty bins,
    keeping both engines hash-exact. Same one-tall-union groupBy(bin)
    plan as the fixed-freq downsample; the anchored bin index is integer
    month arithmetic plus one within-month comparison, and the widened
    scan bound snaps to the anchored grid's upper edge (still a
    pushed-down time predicate)."""
    from qafs_spark.operators.resample import resample_agg_multi

    series = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("time"))
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("v"))
    )
    named = [
        ("orders_sum_cents", series.select(
            "time", F.col("v").alias("orders_sum_cents"))),
        ("orders_days", series.select(
            "time", F.col("v").alias("orders_days"))),
    ]
    return resample_agg_multi(
        named, pd.Timestamp(_ANCH_FROM), pd.Timestamp(_ANCH_TO), "M",
        how={"orders_sum_cents": "sum", "orders_days": "count"},
    )


# ---------------------------------------------------------------------------
# J1/W1 — multi-series outer alignment + forward fill
# ---------------------------------------------------------------------------
@register(
    "align_ffill",
    oracle=f"""
    WITH s1 AS (
        SELECT date_trunc('day', o_orderdate) AS time,
               CAST(sum({_SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS orders_cents
        FROM orders GROUP BY 1
    ),
    s2 AS (
        SELECT date_trunc('day', l_shipdate) AS time,
               CAST(sum({_SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS lineitem_cents
        FROM lineitem GROUP BY 1
    ),
    joined AS (
        SELECT coalesce(s1.time, s2.time) AS time, s1.orders_cents, s2.lineitem_cents
        FROM s1 FULL JOIN s2 ON s1.time = s2.time
    )
    SELECT time,
           last_value(orders_cents IGNORE NULLS) OVER (
               ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS orders_cents,
           last_value(lineitem_cents IGNORE NULLS) OVER (
               ORDER BY time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS lineitem_cents
    FROM joined
    """,
)
def q_align_ffill(spark, sf_dir):
    """SURVEY §2 J1/W1 (reference timeseries.py:12-14): outer-align two daily
    revenue series and forward-fill — via the scalable two-pass ffill."""
    s1 = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("time"))
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("orders_cents"))
    )
    s2 = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(F.date_trunc("day", F.col("l_shipdate")).alias("time"))
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("lineitem_cents"))
    )
    return align_features([("orders_cents", s1), ("lineitem_cents", s2)])


# ---------------------------------------------------------------------------
# A2 — data bounds (default from/to derivation)
# ---------------------------------------------------------------------------
@register(
    "data_bounds",
    oracle="""
    SELECT event_type, min(ts) AS min_time, max(ts) AS max_time,
           count(*) AS n_rows
    FROM events GROUP BY event_type
    """,
)
def q_data_bounds(spark, sf_dir):
    """SURVEY §2 A2 (reference pandas.py:150-155): min/max time bounds."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.min("ts").alias("min_time"),
            F.max("ts").alias("max_time"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# S2.8 — JSON scalar functions (serialized-value surface)
# ---------------------------------------------------------------------------
@register(
    "json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark, sf_dir):
    """SURVEY §2.8 JSON decode (reference pandas.py:133-140 serialized path)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# General analytics (the substrate Spark provides "for free" — SURVEY §2.3)
# ---------------------------------------------------------------------------
@register(
    "tpch_q1",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           CAST(sum({_SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS sum_base_cents,
           CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS sum_disc_cents,
           CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount) * (1 + l_tax)')}) AS BIGINT) AS sum_charge_cents,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark, sf_dir):
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc * (1 + F.col("l_tax"))
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit(pd.Timestamp("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(disc)).alias("sum_disc_cents"),
            F.sum(cents(charge)).alias("sum_charge_cents"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_cents,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1997-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue_cents DESC, l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark, sf_dir):
    """Shipping-priority style query: selective joins + top-k. The customer
    dimension side is broadcast (small) — no shuffle of lineitem for it."""
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(pd.Timestamp("1997-03-15"))
    )
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(pd.Timestamp("1997-03-15"))
    )
    return (
        l.join(
            F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
            l.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
        .select("l_orderkey", "revenue_cents", "o_orderdate")
        .orderBy(F.col("revenue_cents").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@register(
    "tpch_q5",
    oracle=f"""
    SELECT n_name,
           CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')}) AS BIGINT) AS revenue_cents
    FROM region, nation, customer, orders, lineitem
    WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n_name
    """,
)
def q_tpch_q5(spark, sf_dir):
    """Local-volume style multi-join: every dimension side broadcast, the
    only shuffle is the final groupBy on a handful of nation keys."""
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(pd.Timestamp("1996-01-01")))
        & (F.col("o_orderdate") < F.lit(pd.Timestamp("1998-01-01")))
    )
    l = _t(spark, sf_dir, "lineitem")
    dims = (
        c.join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
               c.c_nationkey == F.col("n_nationkey"))
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "revenue_cents"
            )
        )
    )


@register(
    "top_customers_per_nation",
    oracle=f"""
    SELECT n_name, c_custkey, revenue_cents, rank FROM (
        SELECT n_name, c_custkey, revenue_cents,
               row_number() OVER (
                   PARTITION BY n_name
                   ORDER BY revenue_cents DESC, c_custkey ASC
               ) AS rank
        FROM (
            SELECT n_name, c_custkey,
                   CAST(sum({_SQL_CENTS.format(x='o_totalprice')}) AS BIGINT) AS revenue_cents
            FROM nation, customer, orders
            WHERE n_nationkey = c_nationkey AND c_custkey = o_custkey
            GROUP BY n_name, c_custkey
        )
    ) WHERE rank <= 3
    """,
)
def q_top_customers_per_nation(spark, sf_dir):
    """SURVEY §2.5-style window function surface: top-k per group."""
    from pyspark.sql import Window

    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(cents(F.col("o_totalprice"))).alias("revenue_cents"))
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("revenue_cents").desc(), F.col("c_custkey").asc()
    )
    return rev.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 3)


# ---------------------------------------------------------------------------
# Sessionization (streaming-shaped semantics, batch parity check)
# ---------------------------------------------------------------------------
@register(
    "sessionize",
    oracle=f"""
    WITH flags AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                         OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            >= INTERVAL 15 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
    ),
    sess AS (
        SELECT *, sum(new_s) OVER (
            PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        ) AS sid
        FROM flags
    )
    SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
           CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS sum_cents
    FROM sess GROUP BY user_id, sid
    """,
)
def q_sessionize(spark, sf_dir):
    """Gap-based sessions via F.session_window (batch mode) — the same
    operator the streaming path uses (SURVEY §2.9 extension)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy(F.session_window(F.col("ts"), "15 minutes"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_cents",
        )
    )


# ---------------------------------------------------------------------------
# Text analysis (pipeline extension)
# ---------------------------------------------------------------------------
_SQL_TOKENS = "string_split_regex(trim(text), '\\s+')"
_SQL_EN_STOP = "['the','a','of','and','to','in','is','that','it','for']"


@register(
    "doc_stats",
    oracle=rf"""
    SELECT doc_id,
           CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                ELSE len({_SQL_TOKENS}) END AS BIGINT) AS n_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]'))
                AS BIGINT) AS n_bpe_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CASE WHEN length(trim(text)) = 0 OR len({_SQL_TOKENS}) = 0 THEN 0.0
                ELSE CAST(len(list_filter(list_transform({_SQL_TOKENS}, x -> lower(x)),
                                          x -> list_contains({_SQL_EN_STOP}, x))) AS DOUBLE)
                     / CAST(len({_SQL_TOKENS}) AS DOUBLE)
           END AS stopword_ratio
    FROM documents
    """,
)
def q_doc_stats(spark, sf_dir):
    """Pipeline: token counting + quality signals, pure column expressions."""
    t = F.col("text")
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        tx.token_count(t).alias("n_tokens"),
        tx.bpe_ish_token_count(t).alias("n_bpe_tokens"),
        tx.char_count(t).alias("n_chars"),
        tx.stopword_ratio(t).alias("stopword_ratio"),
    )


def _sql_lang_score(words) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return (
        f"CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
        f"len(list_filter(list_transform({_SQL_TOKENS}, x -> lower(x)), "
        f"x -> list_contains({arr}, x))) END"
    )


@register(
    "lang_id",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id,
               {_sql_lang_score(tx.LANG_STOPWORDS['en'])} AS s_en,
               {_sql_lang_score(tx.LANG_STOPWORDS['de'])} AS s_de,
               {_sql_lang_score(tx.LANG_STOPWORDS['fr'])} AS s_fr,
               {_sql_lang_score(tx.LANG_STOPWORDS['es'])} AS s_es
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
                WHEN s_es > s_fr AND s_es > s_de AND s_es > s_en THEN 'es'
                WHEN s_fr > s_de AND s_fr > s_en THEN 'fr'
                WHEN s_de > s_en THEN 'de'
                ELSE 'en' END AS lang_guess
    FROM scored
    """,
)
def q_lang_id(spark, sf_dir):
    """Pipeline: stopword-vote language ID (first-wins tie order en>de>fr>es,
    mirrored in the oracle's CASE ordering). Staged-token variant (round
    17): the single-expression ``lang_id`` duplicated every language's
    score sub-expression through the chained argmax — 40 tokenize passes
    per row in the plan, collapsed to 1 by ``lang_table``'s staged
    projections (values identical, measured 3.59 → 0.57 s at sf0.1)."""
    return (
        tx.lang_table(_t(spark, sf_dir, "documents"), "text", "doc_id")
        .select(F.col("id").alias("doc_id"), "lang_guess")
    )


@register(
    "token_stats_by_source",
    oracle=f"""
    SELECT source,
           CAST(sum(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE len({_SQL_TOKENS}) END AS BIGINT)) AS BIGINT) AS total_tokens,
           count(*) AS n_docs,
           CAST(sum(CAST(length(text) AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
)
def q_token_stats_by_source(spark, sf_dir):
    return (
        _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(
            F.sum(tx.token_count(F.col("text"))).alias("total_tokens"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tx.char_count(F.col("text"))).alias("total_chars"),
        )
    )


@register(
    "exact_dedup",
    oracle="""
    SELECT md5(text) AS content_hash, min(doc_id) AS rep_id, count(*) AS n_dups
    FROM documents GROUP BY md5(text)
    """,
)
def q_exact_dedup(spark, sf_dir):
    """Pipeline: exact dedup by content hash (SURVEY Phase 4)."""
    return dd.exact_dedup(_t(spark, sf_dir, "documents"), "text", "doc_id")


_SQL_SHINGLES = """
    SELECT doc_id, h, count(*) OVER (PARTITION BY doc_id) AS n_sh FROM (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(t[CAST(i AS INTEGER)] || ' ' ||
                                   t[CAST(i AS INTEGER)+1] || ' ' ||
                                   t[CAST(i AS INTEGER)+2]), 1, 8))::BIGINT AS h
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents WHERE length(trim(text)) > 0),
             UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3
    )
"""


@register(
    "ngram_jaccard",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES})
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def q_ngram_jaccard(spark, sf_dir):
    """Pipeline: exact word-3-gram Jaccard near-dup pairs (threshold 0.5).

    max_doc_frac=None explicitly: this query's oracle replays the UNGUARDED
    exact semantics, so the skew guard (default "auto") must be off here or
    query and oracle would diverge on fixtures with hot shingles. The
    guarded variant is certified separately by ngram_jaccard_capped."""
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.5,
        max_doc_frac=None,
    )


@register(
    "duplicated_spans",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    occ AS (
        SELECT doc_id, CAST(i AS INTEGER) AS pos,
               ('0x' || substr(md5(array_to_string(
                    t[CAST(i AS INTEGER):CAST(i AS INTEGER)+7], ' ')), 1, 8)
               )::BIGINT AS h
        FROM tok, UNNEST(range(1, len(t) - 6)) AS u(i)
        WHERE len(t) >= 8
    ),
    hot AS (SELECT h FROM occ GROUP BY h HAVING count(DISTINCT doc_id) >= 2),
    hits AS (SELECT doc_id, pos, pos + 7 AS e FROM occ
             WHERE h IN (SELECT h FROM hot)),
    marked AS (
        SELECT doc_id, pos, e,
               CASE WHEN pos > coalesce(max(e) OVER (
                        PARTITION BY doc_id ORDER BY pos, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ), -2) + 1 THEN 1 ELSE 0 END AS ni
        FROM hits
    ),
    islands AS (
        SELECT doc_id, pos, e,
               sum(ni) OVER (PARTITION BY doc_id ORDER BY pos, e
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS isl
        FROM marked
    )
    SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
           CAST(max(e) AS BIGINT) AS span_end,
           CAST(max(e) - min(pos) + 1 AS BIGINT) AS n_tokens
    FROM islands GROUP BY doc_id, isl
    """,
)
def q_duplicated_spans(spark, sf_dir):
    """Pipeline: cross-document duplicated-span report (bounded
    exact-substring dedup audit, Lee et al. '22 shape) — maximal token
    intervals covered by 8-grams occurring in >= 2 distinct docs
    (touching hits merge: only a coverage GAP starts a new span). Hot-gram
    set via map-side-combined count_distinct; island merge via per-doc
    windows (no global window); positions 1-based inclusive
    (pipeline/dedup.py:duplicated_spans)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return dd.duplicated_spans(docs, "text", "doc_id", min_tokens=8)


@register(
    "ngram_containment",
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES})
    SELECT id_a, id_b, containment FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(least(any_value(a.n_sh), any_value(b.n_sh)) AS DOUBLE)
                   AS containment
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE containment >= 0.6
    """,
)
def q_ngram_containment(spark, sf_dir):
    """Pipeline: exact word-3-gram CONTAINMENT near-dup pairs (threshold
    0.6) — Broder's asymmetric measure |A∩B|/min(|A|,|B|): catches the
    superset/quotation duplicates symmetric Jaccard structurally misses (a
    doc embedded in a 10× larger one has Jaccard ≈ 0.1, containment 1.0).
    Same candidate machinery and skew guard as ngram_jaccard;
    max_doc_frac=None keeps query and oracle semantically identical
    (pipeline/dedup.py:ngram_containment_pairs)."""
    return dd.ngram_containment_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.6,
        max_doc_frac=None,
    )


@register(
    "ngram_jaccard_capped",
    # df-capped Jaccard: shingles in > 1% of docs are stop-shingles —
    # excluded from candidate generation AND the similarity itself. The
    # oracle replays the cap exactly (integer df vs n_docs * frac).
    oracle="""
    WITH sh0 AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(t[CAST(i AS INTEGER)] || ' ' ||
                                   t[CAST(i AS INTEGER)+1] || ' ' ||
                                   t[CAST(i AS INTEGER)+2]), 1, 8))::BIGINT AS h
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents WHERE length(trim(text)) > 0),
             UNNEST(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3
    ),
    hot AS (
        SELECT h FROM sh0 GROUP BY h
        HAVING CAST(count(*) AS DOUBLE) > (SELECT count(*) FROM documents) * 0.01
    ),
    kept AS (
        SELECT doc_id, h, count(*) OVER (PARTITION BY doc_id) AS n_sh
        FROM sh0 WHERE h NOT IN (SELECT h FROM hot)
    )
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def q_ngram_jaccard_capped(spark, sf_dir):
    """Pipeline: df-capped n-gram Jaccard — the skew-hardened variant that
    drops shingles present in > 1% of documents (stop-shingles) before the
    quadratic candidate join. At this sf the cap drops the ~29 hottest
    shingles; at 100 TB it is what keeps boilerplate grams from turning the
    shingle join O(corpus²)."""
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.5,
        max_doc_frac=0.01,
    )


@register(
    "minhash_lsh_dedup",
    # The exact n-gram Jaccard result IS a valid oracle here: candidate
    # pairs are exact-verified (false positives filtered), and the banded
    # signatures are fully deterministic (md5 shingle hashes, seed=42), so
    # candidate recall is a fixed property of the dataset — verified 25/25
    # pairs identical to the exact operator at sf0.01. A recall miss would
    # surface as a deterministic, debuggable diff, not flakiness.
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES})
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def q_minhash_lsh_dedup(spark, sf_dir):
    """Pipeline: MinHash+LSH banded near-dup with exact verification.
    Same output contract as ngram_jaccard; with 16 bands × 2 rows the
    candidate recall at jaccard 0.5 is ≥ 1-(1-0.5^2)^16 ≈ 99%."""
    return dd.minhash_lsh_dedup(
        _t(spark, sf_dir, "documents"),
        "text",
        "doc_id",
        n=3,
        num_hashes=32,
        num_bands=16,
        threshold=0.5,
        # Explicit exact mode: the oracle is the unguarded exact-Jaccard
        # result, so the bucket-cap guard must be off for this query to be
        # semantically identical to it on ANY fixture (not just ones whose
        # hottest bucket stays under the default cap).
        max_band_size=None,
    )


@register(
    "incremental_dedup",
    # Same validity argument as minhash_lsh_dedup: candidates are
    # exact-verified and the signatures are deterministic, so the exact
    # Jaccard pairs RESTRICTED to pairs touching the new batch are a valid
    # oracle; any recall miss would be a deterministic diff.
    oracle=f"""
    WITH sh AS ({{shingles}})
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5 AND (id_a % 5 = 0 OR id_b % 5 = 0)
    """.format(shingles=_SQL_SHINGLES),
)
def q_incremental_dedup(spark, sf_dir):
    """Pipeline: continuous-ingestion dedup — 80% of the corpus (doc_id %
    5 != 0) is the pre-built MinHash index, the remaining 20% arrives as a
    batch; the batch is deduped against index + itself without the corpus
    ever being re-tokenized (pipeline/incremental.py). Pair set is
    bit-equal to the batch operator restricted to pairs touching the
    batch (asserted by the parity test in test_pipeline.py)."""
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    # In production the index IS a stored parquet dataset; built inline
    # from text here, the pairs plan references it ~4x (banding, the
    # guard-free candidate join, both verify sides) and each reference
    # re-tokenizes the 80% corpus. Persist both sketch frames (round 17
    # — the same within-plan materialization the streaming sink applies
    # to its batch sketch); rows and plan semantics unchanged.
    idx = inc.minhash_index(old, "text", "doc_id", n=3, num_hashes=32).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    pairs, new_rows = inc.incremental_minhash_dedup(
        new, idx, "text", "doc_id", n=3, num_hashes=32, num_bands=16,
        threshold=0.5,
        max_band_size=None,  # exact mode — oracle replays unguarded pairs
    )
    new_rows.persist(StorageLevel.MEMORY_AND_DISK)
    return pairs


def _stage_stream_files(spark, df, key_col: str, root: str) -> str:
    """Write ``df`` as 3 single-file micro-batch inputs (``key % 3``)
    under ``root/in`` with deterministic mtimes (mtime drives file-source
    batch order; batch contents are order-independent, the pinned mtimes
    just keep runs identical). Staged driver-side (round 16, guide §1.2):
    micro-batch inputs are batch-sized by construction (the file source
    feeds ONE file per trigger), so this is one partition-ordered collect
    plus three pyarrow writes instead of three single-task Spark jobs
    whose cost was pure scheduling + committer overhead (~1.3 s each for
    a <1 MB file). Rows, slice membership (``np.fmod`` is the C remainder,
    matching Spark's ``%`` on negatives), row order (partition-order
    collect — the same order ``coalesce(1)`` produced) and mtimes are
    identical to the old job-based staging. At real scale micro-batch
    inputs arrive from the ingest system; the query never stages them —
    and the row cap below (round 17, r16 verdict) makes that contract
    LOUD: this is a driver-side collect, so a fixture outgrowing
    batch-sized inputs must fail here instead of silently growing the
    driver's memory term."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(root, "in")
    os.makedirs(src)
    cap = 1_000_000  # far above any gate fixture, far below driver limits
    # bound the collect itself (no extra probe job): CollectLimit streams
    # partitions in order, so under the cap the rows and their order are
    # exactly df.toArrow()'s
    tbl = df.limit(cap + 1).toArrow()
    if tbl.num_rows > cap:
        raise ValueError(
            f"_stage_stream_files: source exceeds {cap} rows — micro-batch "
            "input staging is a driver-side collect by design (batch-sized "
            "inputs only); feed the stream from real ingest files instead"
        )
    rem = np.fmod(tbl.column(key_col).to_numpy(), 3)
    for k in range(3):
        dst = os.path.join(src, f"b{k}.parquet")
        pq.write_table(tbl.filter(pa.array(rem == k)), dst)
        os.utime(dst, (1_700_000_000 + k, 1_700_000_000 + k))
    return src


@register(
    "stream_incremental_dedup",
    # The accumulated pairs log over ALL micro-batches is the complete
    # batch pair set (each pair lands exactly once, in the batch where its
    # later document arrives), so the oracle is the same exact-Jaccard
    # pair set as minhash_lsh_dedup — stream/batch parity, proven against
    # SQL rather than against the batch operator.
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES})
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def q_stream_incremental_dedup(spark, sf_dir):
    """Streaming: the corpus arrives as 3 micro-batches (doc_id % 3, one
    file per trigger); streaming_minhash_dedup maintains the persisted
    MinHash index across batches and appends each batch's near-dup pairs.
    The accumulated log must equal the batch operator's full pair set
    (streaming/dedup_lsh.py)."""
    import os
    import tempfile

    from .streaming.dedup_lsh import dedup_pairs, streaming_minhash_dedup

    root = tempfile.mkdtemp(prefix="qafs_streamdedup_")
    docs = _t(spark, sf_dir, "documents")
    src = _stage_stream_files(spark, docs, "doc_id", root)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pairs_path = os.path.join(root, "pairs")
    q = streaming_minhash_dedup(
        stream, os.path.join(root, "index"), pairs_path,
        os.path.join(root, "ckpt"),
        n=3, num_hashes=32, num_bands=16, threshold=0.5,
        max_band_size=None,  # exact mode — oracle replays unguarded pairs
    )
    q.awaitTermination(300)
    # applied-batches-only reader: exactly-once view even if a trigger's
    # commit had died between the pairs and index writes
    return dedup_pairs(
        spark, os.path.join(root, "index"), pairs_path
    ).select("id_a", "id_b", "jaccard")


@register(
    "banded_incremental_dedup",
    # Identical oracle to incremental_dedup: the band-partitioned index is
    # proven bit-equal to the flat incremental path (parity test), and both
    # exact-verify candidates under deterministic signatures.
    oracle=f"""
    WITH sh AS ({{shingles}})
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5 AND (id_a % 5 = 0 OR id_b % 5 = 0)
    """.format(shingles=_SQL_SHINGLES),
)
def q_banded_incremental_dedup(spark, sf_dir):
    """Pipeline: continuous-ingestion dedup against the BAND-PARTITIONED
    persisted index (pipeline/banded_index.py) — band keys and per-band
    counts are persisted at index time and every probe read is
    partition-pruned to the batch's band/id prefix set, so per-batch cost
    scales with the batch, never the corpus. 80% of the corpus is applied
    as batch 0; the remaining 20% dedups against it. Pair set bit-equal to
    incremental_dedup (parity-tested)."""
    import tempfile

    from .pipeline.banded_index import BandedMinHashIndex

    docs = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    idx = BandedMinHashIndex(
        spark, tempfile.mkdtemp(prefix="qafs_bandedix_"),
        n=3, num_hashes=32, num_bands=16, num_partitions=32,
    )
    idx.apply_batch(
        old, 0, text_col="text", id_col="doc_id",
        threshold=0.5, max_band_size=None,  # exact mode — oracle replays unguarded
    )
    pairs, _ = idx.dedup_batch(
        new, "text", "doc_id", threshold=0.5, max_band_size=None,
    )
    return pairs


@register(
    "stream_banded_dedup",
    # Same oracle as stream_incremental_dedup: the accumulated pairs log
    # over all micro-batches is the complete batch pair set; the banded
    # sink additionally commits each batch exactly once.
    oracle=f"""
    WITH sh AS ({_SQL_SHINGLES})
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(count(*) AS DOUBLE)
               / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE) AS jaccard
        FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ) WHERE jaccard >= 0.5
    """,
)
def q_stream_banded_dedup(spark, sf_dir):
    """Streaming: the corpus arrives as 3 micro-batches through the
    EXACTLY-ONCE band-partitioned dedup sink (streaming/dedup_lsh.py:
    streaming_banded_dedup) — per batch, partition-pruned probes against
    the persisted banded index, outputs committed idempotently into
    batch_id=N directories. The accumulated pairs log must equal the batch
    operator's full pair set."""
    import os
    import tempfile

    from .pipeline.banded_index import BandedMinHashIndex
    from .streaming.dedup_lsh import streaming_banded_dedup

    root = tempfile.mkdtemp(prefix="qafs_bandedstream_")
    docs = _t(spark, sf_dir, "documents")
    src = _stage_stream_files(spark, docs, "doc_id", root)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ix_root = os.path.join(root, "ix")
    q = streaming_banded_dedup(
        stream, ix_root, os.path.join(root, "ckpt"),
        n=3, num_hashes=32, num_bands=16, threshold=0.5,
        max_band_size=None, num_partitions=32,
    )
    q.awaitTermination(300)
    return BandedMinHashIndex(
        spark, ix_root, n=3, num_hashes=32, num_bands=16, num_partitions=32
    ).pairs().select("id_a", "id_b", "jaccard")


def _sql_simhash() -> str:
    return """
    WITH tok AS (
        SELECT doc_id, ('0x' || substr(md5(t), 1, 15))::BIGINT AS h
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS t
              FROM documents WHERE length(trim(text)) > 0)
    ),
    votes AS (
        SELECT doc_id, CAST(b AS INTEGER) AS b,
               sum(CASE WHEN (h >> CAST(b AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS v
        FROM tok, UNNEST(range(0, 60)) AS u(b)
        GROUP BY doc_id, b
    ),
    sketch AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS sh
        FROM votes GROUP BY doc_id
    )
    """


@register(
    "simhash_pairs",
    oracle=f"""
    {_sql_simhash()}
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS distance
    FROM sketch a JOIN sketch b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
)
def q_simhash_pairs(spark, sf_dir):
    """Pipeline: SimHash near-dup pairs, hamming <= 3 (pigeonhole-block
    candidate generation is lossless, so this equals the all-pairs oracle;
    4 blocks × 15 bits keeps the candidate join selective)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return dd.simhash_pairs(docs, "text", "doc_id", max_distance=3)


# ---------------------------------------------------------------------------
# Similarity search (pipeline extension)
# ---------------------------------------------------------------------------
_SQL_COSINE = """
    list_sum(list_transform(range(1, 65),
        i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
             * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))
    / (sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE)
             * CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, 65),
        i -> CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)
             * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)))))
"""


@register(
    "ann_topk",
    oracle=f"""
    SELECT query_id, neighbor_id, cosine_r6, rank FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_SQL_COSINE}, 6) AS cosine_r6,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_SQL_COSINE} DESC, b.vec_id ASC
               ) AS rank
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 10
    ) WHERE rank <= 5
    """,
)
def q_ann_topk(spark, sf_dir):
    """Pipeline: brute-force cosine top-5 for 10 query vectors — the exact
    ANN baseline (LSH variant is checked against this in tests)."""
    emb = _t(spark, sf_dir, "embeddings")
    out = sim.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5)
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine_r6"),
        "rank",
    )


@register(
    "embedding_neardup",
    oracle=f"""
    SELECT id_a, id_b, cosine_r6 FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_SQL_COSINE}, 6) AS cosine_r6
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cosine_r6 >= 0.3
    """,
)
def q_embedding_neardup(spark, sf_dir):
    """Pipeline: embedding-cosine near-dup pairs (exact threshold join)."""
    emb = _t(spark, sf_dir, "embeddings")
    pairs = dd.embedding_dedup_pairs(
        emb, "embedding", "vec_id", threshold=0.0, use_lsh=False
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine_r6")
    ).filter(F.col("cosine_r6") >= 0.3)


# ---------------------------------------------------------------------------
# Multimodal (binary columns) — byte-level metadata is oracle-checkable
# ---------------------------------------------------------------------------
@register(
    "binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    """,
)
def q_binary_meta(spark, sf_dir):
    """Pipeline: treat text bytes as an opaque binary asset; extract
    byte-level metadata (the decode stage itself is stubbed — see
    qafs_spark.pipeline.multimodal)."""
    return _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.md5(F.col("text")).alias("content_md5"),
    )


@register(
    "multimodal_decode",
    # The fake decoder is deterministic md5 arithmetic, so it IS
    # SQL-expressible: content = 'FAKEIMG1' || md5(text); the 8x8 'image'
    # tiles md5(content)'s 16 digest bytes 4x, so mean_intensity is the
    # mean of those 16 bytes (hex pairs decoded via strpos arithmetic).
    oracle="""
    WITH c AS (
        SELECT doc_id, 'FAKEIMG1' || md5(text) AS content FROM documents
    )
    SELECT doc_id,
           CAST(8 AS BIGINT) AS width,
           CAST(8 AS BIGINT) AS height,
           list_avg([
               (strpos('0123456789abcdef', substr(md5(content), 2*i-1, 1)) - 1) * 16
             + (strpos('0123456789abcdef', substr(md5(content), 2*i, 1)) - 1)
             for i in range(1, 17)
           ]) AS mean_intensity,
           sha256(content) AS sha
    FROM c
    """,
)
def q_multimodal_decode(spark, sf_dir):
    """Pipeline: full multimodal plumbing — fake-encode text as binary
    assets, decode via Arrow-batched mapInPandas, return per-asset features.
    The fake codec is pure md5 arithmetic, so the DuckDB oracle replays it
    in SQL and the driver hash-checks the full distributed decode path."""
    from .pipeline import multimodal as mm

    assets = _t(spark, sf_dir, "documents").select(
        "doc_id", mm.fake_image_bytes(F.col("text")).alias("content")
    )
    return mm.decode_images(assets).select(
        "doc_id",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "mean_intensity",
        "sha",
    )


# ---------------------------------------------------------------------------
# Streaming (Structured Streaming execution, SQL-tumbling oracle)
# ---------------------------------------------------------------------------
@register(
    "stream_tumbling",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n_events,
           CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS sum_cents
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark, sf_dir):
    """Streaming: 1h tumbling windows executed by Structured Streaming
    (availableNow trigger, complete mode into a memory sink) — the oracle is
    the equivalent batch SQL, proving stream/batch parity."""
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # stream schema must match how THIS Spark surfaces TIMESTAMP(NANOS) —
    # probed + normalized by the shared helper (the r3 regression was a
    # hardcoded LongType schema silently reinterpreting micros as nanos).
    from .sources.events import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(F.window(F.col("ts"), "1 hour"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )
    name = f"qafs_stream_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


# ---------------------------------------------------------------------------
# Feature-store end-to-end round trip (the engine itself, vs SQL oracle)
# ---------------------------------------------------------------------------
@register(
    "feature_roundtrip",
    oracle=f"""
    WITH series AS ({_SQL_LWW}),
    binned AS (
        SELECT CAST(ceil((epoch(time) - epoch(TIMESTAMP '2024-01-10 00:00:00'))
                    / 86400.0) AS BIGINT) AS k,
               arg_max(value, time) AS value
        FROM series
        WHERE time <= TIMESTAMP '2024-01-28 00:00:00'
        GROUP BY 1
    ),
    grid AS (SELECT CAST(unnest(range(0, 19)) AS BIGINT) AS k),
    allk AS (SELECT k FROM grid UNION SELECT k FROM binned),
    filled AS (
        SELECT a.k,
               last_value(b.value IGNORE NULLS) OVER (
                   ORDER BY a.k ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value
        FROM allk a LEFT JOIN binned b USING (k)
    )
    SELECT TIMESTAMP '2024-01-10 00:00:00' + k * INTERVAL 1 DAY AS time, value
    FROM filled WHERE k BETWEEN 0 AND 18
    """,
)
def q_feature_roundtrip(spark, sf_dir):
    """THE end-to-end check: ingest the events series through
    FeatureStore.save_df (real partitioned-Parquet write + registry), load it
    back with load_features(freq='1d', from, to) — scan, derived partition
    pruning, LWW dedup, bin-compressed as-of resample — and match the SQL
    golden computed directly on the raw events."""
    import shutil
    import tempfile

    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_roundtrip_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        from .checks import Column

        fs.create_feature("bench/event_value", check=Column(float))
        src = _event_series_df(spark, sf_dir).select("time", "created_time",
                                                     F.col("value").alias("bench/event_value"))
        fs.save_df(src, "bench/event_value")
        out = fs.load_features(
            "bench/event_value",
            from_date="2024-01-10",
            to_date="2024-01-28",
            freq="1d",
        )
        result = out.select(
            F.col("time"), F.col("bench/event_value").alias("value")
        )
        result = spark.createDataFrame(result.collect(), schema=result.schema)
        return result
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "compact_collapse",
    # what is physically ON DISK after an LWW-collapsing compaction must be
    # exactly the last-write-wins view of everything ever saved
    oracle=f"""
    SELECT time, value FROM (
        SELECT time, value,
               row_number() OVER (
                   PARTITION BY time ORDER BY created_time DESC
               ) AS rn
        FROM (
            SELECT time, created_time, arg_max(value, event_id) AS value
            FROM ({_SQL_EVENT_SERIES})
            GROUP BY time, created_time
        )
    ) WHERE rn = 1
    """,
)
def q_compact_collapse(spark, sf_dir):
    """Round-5 maintenance op: ingest the event series through save_df,
    run FeatureStore.compact(collapse_lww=True), and return the feature's
    RAW on-disk rows — proving the rewrite physically collapsed the
    append-only version history to one LWW row per timestamp (the read
    path no longer pays the dedup over N superseded versions). The input
    is pre-deduped to one row per (time, created_time) so the collapse's
    max_by(created_time) is deterministic and the DuckDB oracle can replay
    it bit-for-bit."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_compact_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        fs.create_feature("bench/cc", check=Column(float))
        src = (
            _event_series_df(spark, sf_dir)
            .groupBy("time", "created_time")
            .agg(F.max_by("value", "event_id").alias("bench/cc"))
        )
        fs.save_df(src, "bench/cc")
        fs.compact("bench/cc", collapse_lww=True)
        raw = spark.read.parquet(fs._path("bench", "cc")).select("time", "value")
        return spark.createDataFrame(raw.collect(), schema=raw.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def feature_roundtrip_segments(spark, sf_dir):
    """Bench-attribution variant of :func:`q_feature_roundtrip`: returns
    ``(ingest, load, cleanup)`` thunks so bench.py can time the partitioned
    write+registry segment separately from the scan→LWW→resample load
    segment (round-over-round regressions become attributable)."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_roundtrip_")
    # write_partitions: the documented parallel-ingest knob (FeatureStore
    # docstring / write_feature(distribute=...)). The sf0.1 events fixture
    # is ONE parquet file → one scan partition → without this the whole
    # derive+sort+write pipeline serializes on a single core (measured
    # 1.27s → 0.72s warm at 8 writer tasks on local[32]).
    fs = FeatureStore(storage=root, spark=spark, write_partitions=8)
    fs.create_namespace("bench")
    fs.create_feature("bench/event_value", check=Column(float))

    def ingest():
        src = _event_series_df(spark, sf_dir).select(
            "time", "created_time", F.col("value").alias("bench/event_value")
        )
        fs.save_df(src, "bench/event_value")

    def load():
        return fs.load_features(
            "bench/event_value",
            from_date="2024-01-10",
            to_date="2024-01-28",
            freq="1d",
        )

    def cleanup():
        shutil.rmtree(root, ignore_errors=True)

    return ingest, load, cleanup


# ---------------------------------------------------------------------------
# Additional analytics coverage (scan-pushdown, semi-join, conditional agg)
# ---------------------------------------------------------------------------
@register(
    "tpch_q6",
    oracle=f"""
    SELECT CAST(sum({_SQL_CENTS.format(x='l_extendedprice * l_discount')}) AS BIGINT)
           AS revenue_cents
    FROM lineitem
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)
def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6: the pure scan-filter-agg — every predicate reaches the
    Parquet reader (PushedFilters), projection prunes to 4 columns."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * F.col("l_discount")))
            .alias("revenue_cents")
        )
    )


@register(
    "tpch_q4",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY o_orderpriority
    """,
)
def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (adapted to the synthetic schema: "late" = shipped
    >30 days after order): EXISTS → left-semi join, no row multiplication;
    the filtered orders side is small enough for AQE to broadcast."""
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01"))
        & (F.col("o_orderdate") < F.lit("1995-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > F.date_add(o.o_orderdate, 30)),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q12",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
    GROUP BY l_returnflag
    """,
)
def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (adapted: ship-year filter, returnflag grouping):
    selective fact-side filter before the join + conditional aggregation
    (sum-of-CASE stays in codegen)."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-01-01"))
    )
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Text quality scoring + document fingerprinting (pipeline extension)
# ---------------------------------------------------------------------------
_SQL_PUNCT_RATIO = """
    CASE WHEN length(text) = 0 THEN 0.0
         ELSE CAST(length(regexp_replace(text, '[^!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE)
              / CAST(length(text) AS DOUBLE) END
"""

_SQL_MWL = f"""
    CASE WHEN length(trim(text)) = 0 OR len({_SQL_TOKENS}) = 0 THEN 0.0
         ELSE CAST(list_sum(list_transform({_SQL_TOKENS}, x -> length(x))) AS DOUBLE)
              / CAST(len({_SQL_TOKENS}) AS DOUBLE) END
"""

_SQL_SW_RATIO = f"""
    CASE WHEN length(trim(text)) = 0 OR len({_SQL_TOKENS}) = 0 THEN 0.0
         ELSE CAST(len(list_filter(list_transform({_SQL_TOKENS}, x -> lower(x)),
                                   x -> list_contains({_SQL_EN_STOP}, x))) AS DOUBLE)
              / CAST(len({_SQL_TOKENS}) AS DOUBLE) END
"""

_SQL_NTOK = f"""
    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_SQL_TOKENS}) END
"""


@register(
    "quality_score",
    oracle=f"""
    WITH signals AS (
        SELECT doc_id,
               {_SQL_NTOK} AS n,
               {_SQL_SW_RATIO} AS sw,
               {_SQL_PUNCT_RATIO} AS pr,
               {_SQL_MWL} AS mwl
        FROM documents
    )
    SELECT doc_id,
           (((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0
                   WHEN n = 0 THEN 0.0 ELSE 0.5 END * 0.3)
             + (CASE WHEN sw >= 0.05 THEN 1.0 ELSE sw * 20.0 END * 0.3))
            + ((1.0 - least(pr * 2.0, 1.0)) * 0.2))
           + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END * 0.2)
           AS quality
    FROM signals
    """,
)
def q_quality_score(spark, sf_dir):
    """Pipeline: Gopher/C4-style [0,1] quality heuristic, pure codegen
    column expressions (length band, stopword presence, punctuation noise,
    mean word length) — formula mirrored term-for-term in the oracle."""
    docs = _t(spark, sf_dir, "documents")
    return tx.quality_table(docs, "text", "doc_id").withColumnRenamed("id", "doc_id")


@register(
    "winnowing_fingerprint",
    oracle="""
    WITH rolling AS (
        SELECT doc_id,
               list_transform(range(1, length(text) - 6),
                   i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 8))::BIGINT
               ) AS hashes
        FROM documents WHERE length(text) >= 8
    ),
    mins AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hashes) - 2),
                   i -> list_min(list_slice(hashes, CAST(i AS INTEGER), CAST(i AS INTEGER) + 3))
               )) AS fp
        FROM rolling WHERE len(hashes) >= 4
    )
    SELECT doc_id, CAST(unnest(fp) AS BIGINT) AS h FROM mins
    """,
)
def q_winnowing_fingerprint(spark, sf_dir):
    """Pipeline: winnowing document fingerprint (Schleimer et al. SIGMOD'03)
    over 8-char rolling hashes, window 4 — exploded to flat (doc_id, h) rows
    so the value-hash comparison is array-representation agnostic."""
    docs = _t(spark, sf_dir, "documents").filter(F.length("text") >= 8 + 4 - 1)
    fp = tx.winnowing_table(docs, "text", "doc_id", k=8, w=4)
    return fp.select(F.col("id").alias("doc_id"), F.explode("fp").alias("h"))


# ---------------------------------------------------------------------------
# A3 — last value per feature (partition-pruned tail read)
# ---------------------------------------------------------------------------
@register(
    "last_value",
    oracle=f"""
    WITH series AS ({_SQL_LWW})
    SELECT arg_max(value, time) AS value FROM series
    """,
)
def q_last_value(spark, sf_dir):
    """SURVEY §2 A3: most-recent value via the feature store's last() —
    reads only the tail partition (descending partition-key probe), then
    top-1 by (time, created_time)."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_last_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        fs.create_feature("bench/event_value", check=Column(float))
        src = _event_series_df(spark, sf_dir).select(
            "time", "created_time", F.col("value").alias("bench/event_value")
        )
        fs.save_df(src, "bench/event_value")
        vals = fs.last("bench/event_value")
        return spark.createDataFrame(
            [(float(vals["bench/event_value"]),)], schema="value double"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


@register(
    "first_value",
    oracle=f"""
    WITH series AS ({_SQL_LWW})
    SELECT arg_min(value, time) AS value FROM series
    """,
)
def q_first_value(spark, sf_dir):
    """SURVEY §2 A3 (symmetric): earliest value via first() — head-partition
    probe, one partition read, LWW within it."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_first_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        fs.create_feature("bench/event_value", check=Column(float))
        src = _event_series_df(spark, sf_dir).select(
            "time", "created_time", F.col("value").alias("bench/event_value")
        )
        fs.save_df(src, "bench/event_value")
        vals = fs.first("bench/event_value")
        return spark.createDataFrame(
            [(float(vals["bench/event_value"]),)], schema="value double"
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# U1/U2/U3 — transform (virtual) features: registered fn over parents
# ---------------------------------------------------------------------------
@register(
    "transform_feature",
    oracle=f"""
    WITH series AS ({_SQL_LWW}),
    daily AS (
        SELECT date_trunc('day', time) AS time,
               CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS cents,
               count(*) AS n
        FROM series GROUP BY 1
    )
    SELECT time, CAST(cents AS DOUBLE) / CAST(n AS DOUBLE) AS value FROM daily
    """,
)
def q_transform_feature(spark, sf_dir):
    """SURVEY §2 U1-U3: cloudpickled transform feature evaluated over two
    parent features (daily cents / daily count) through the recursive DAG
    loader + mapInPandas — the reference's virtual-feature surface
    (core.py:541-582, model.py:183-218) end to end."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_tf_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        fs.create_feature("bench/daily_cents", check=Column(int))
        fs.create_feature("bench/daily_n", check=Column(int))
        series = last_write_wins(
            _event_series_df(spark, sf_dir),
            value_cols=["value"],
            tiebreak_cols=["event_id"],
        )
        daily = series.groupBy(
            F.date_trunc("day", F.col("time")).alias("time")
        ).agg(
            F.sum(cents(F.col("value"))).alias("bench/daily_cents"),
            F.count(F.lit(1)).alias("bench/daily_n"),
        )
        fs.save_df(daily)

        @fs.transform(
            "bench/daily_avg_cents",
            check=Column(float),
            from_features=["bench/daily_cents", "bench/daily_n"],
        )
        def daily_avg(df):
            return df["bench/daily_cents"] / df["bench/daily_n"]

        out = fs.load_features("bench/daily_avg_cents")
        result = out.select("time", F.col("bench/daily_avg_cents").alias("value"))
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Streaming: sliding windows (stream/batch parity oracle)
# ---------------------------------------------------------------------------
@register(
    "stream_sliding",
    oracle=f"""
    WITH expanded AS (
        SELECT CAST(to_timestamp(epoch(ts) - (epoch(ts) % 1800)) AS TIMESTAMP)
                 - CAST(i AS INTEGER) * INTERVAL 30 MINUTE
               AS window_start,
               event_type, value
        FROM events, UNNEST(range(0, 2)) AS u(i)
    )
    SELECT window_start, event_type, count(*) AS n_events,
           CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS sum_cents
    FROM expanded GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark, sf_dir):
    """Streaming: 1h windows sliding every 30min via Structured Streaming —
    each event lands in exactly 2 windows; oracle expands the assignment
    with a range join in SQL."""
    import uuid

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # same probed-schema normalization as stream_tumbling (see
    # sources/events.py for the Spark 4.1 TIMESTAMP(NANOS) story)
    from .sources.events import read_events_stream

    stream = read_events_stream(spark, sf_dir)
    agg = (
        stream.groupBy(
            F.window(F.col("ts"), "1 hour", "30 minutes"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents(F.col("value"))).alias("sum_cents"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_cents",
        )
    )
    name = f"qafs_stream_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.table(name)


def _sql_plane_values(dim: int = 64, num_planes: int = 8, seed: int = 42) -> str:
    """The seeded LSH hyperplanes as a DuckDB ``VALUES`` list of DOUBLE
    arrays. ``sim.hyperplanes`` is a pure function of (dim, planes, seed),
    so the SAME literal floats embed into the Spark plan (via
    ``hyperplane_bucket``) and this oracle SQL — ``%.17e`` round-trips
    float64 exactly (verified: DuckDB parses scientific notation as
    DOUBLE, not DECIMAL)."""
    rows = []
    for i, p in enumerate(sim.hyperplanes(dim, num_planes, seed)):
        vals = ", ".join(format(x, ".17e") for x in p)
        rows.append(f"({i}, [{vals}])")
    return ",\n        ".join(rows)


# Sign-pattern bucket replay: bit i of a vector's bucket = (v · h_i >= 0).
# SUM over BIGINT is HUGEINT in DuckDB — cast back for xor/bit_count.
_SQL_LSH_SIG = f"""
    planes(pid, pvec) AS (VALUES {_sql_plane_values()}),
    sig AS (
        SELECT e.vec_id,
               CAST(sum(CASE WHEN list_sum(list_transform(range(1, 65),
                   j -> CAST(e.embedding[CAST(j AS INTEGER)] AS DOUBLE)
                        * p.pvec[CAST(j AS INTEGER)])) >= 0
                   THEN (CAST(1 AS BIGINT) << p.pid)
                   ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS bucket
        FROM embeddings e CROSS JOIN planes p
        GROUP BY e.vec_id
    )
"""


@register(
    "lsh_ann_topk",
    # Full candidate-generation replay: multiprobe_bits=1 probes the
    # query's bucket plus every 1-bit flip, i.e. candidates are exactly
    # the vectors with hamming(bucket_q, bucket_d) <= 1.
    oracle=f"""
    WITH {_SQL_LSH_SIG},
    qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_SQL_COSINE}, 6) AS cosine_r6,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_SQL_COSINE} DESC, b.vec_id ASC
               ) AS rank
        FROM embeddings a
        JOIN qids ON qids.vec_id = a.vec_id
        JOIN sig sa ON sa.vec_id = a.vec_id
        JOIN sig sb ON bit_count(xor(sa.bucket, sb.bucket)) <= 1
        JOIN embeddings b ON b.vec_id = sb.vec_id AND b.vec_id != a.vec_id
    )
    SELECT query_id, neighbor_id, cosine_r6, rank FROM scored WHERE rank <= 5
    """,
)
def q_lsh_ann_topk(spark, sf_dir):
    """Pipeline: hyperplane-LSH bucketed approximate top-k — the scale path
    for similarity search (bucket equi-join instead of the cross join).
    Oracle-replayable because the hyperplanes are a pure seeded function
    inlined as identical float64 literals in BOTH engines; the oracle
    regenerates the sign-pattern buckets, the hamming<=1 multiprobe
    candidate set, and the exact in-bucket cosine top-5. Recall vs brute
    force is certified separately by `lsh_ann_recall`."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    out = sim.lsh_topk(
        emb, queries, k=5, num_planes=8, multiprobe_bits=1, seed=42, dim=64
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine_r6"),
        "rank",
    )


# IVF candidate-generation replay: the md5-seeded quantizer's centroids
# are EXACT data vectors (no float averaging), so DuckDB re-derives them
# bit-for-bit; cell = argmax cosine (ties -> smallest cell, matching
# numpy argmax / stable argsort in similarity._cell_assigner/_probe_cells).
_SQL_IVF_CELLS = f"""
    cents AS (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cell,
               embedding
        FROM (SELECT vec_id, embedding FROM embeddings
              ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16)
    ),
    vc AS (
        SELECT a.vec_id, b.cell,
               {{cos}} AS cos
        FROM embeddings a CROSS JOIN cents b
    ),
    assigned AS (
        SELECT vec_id, cell FROM (
            SELECT vec_id, cell, row_number() OVER (
                PARTITION BY vec_id ORDER BY cos DESC, cell ASC) AS rn
            FROM vc
        ) WHERE rn = 1
    )
"""


@register(
    "ivf_ann_topk",
    oracle=f"""
    WITH {_SQL_IVF_CELLS.format(cos=_SQL_COSINE)},
    qids AS (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8),
    probes AS (
        SELECT vec_id, cell FROM (
            SELECT v.vec_id, v.cell, row_number() OVER (
                PARTITION BY v.vec_id ORDER BY v.cos DESC, v.cell ASC) AS rn
            FROM vc v JOIN qids ON qids.vec_id = v.vec_id
        ) WHERE rn <= 6
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_SQL_COSINE}, 6) AS cosine_r6,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_SQL_COSINE} DESC, b.vec_id ASC
               ) AS rank
        FROM probes p
        JOIN assigned d ON d.cell = p.cell
        JOIN embeddings a ON a.vec_id = p.vec_id
        JOIN embeddings b ON b.vec_id = d.vec_id AND b.vec_id != a.vec_id
    )
    SELECT query_id, neighbor_id, cosine_r6, rank FROM scored WHERE rank <= 5
    """,
)
def q_ivf_ann_topk(spark, sf_dir):
    """Pipeline: IVF-flat ANN — md5-seeded deterministic coarse quantizer
    (centroids are exact data vectors, so the DuckDB oracle re-derives
    them bit-for-bit), Arrow-batched matmul cell assignment, nprobe-cell
    candidate equi-join. The oracle replays seed selection, argmax-cosine
    cell assignment, top-6 probe ranking, and the in-cell cosine top-5.
    The Lloyd-TRAINED quantizer path (`ivf_train`, float-averaged
    centroids — not float-replayable across engines) stays certified by
    `ivf_ann_recall` + tests/."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    cents = sim.ivf_centroids(emb, nlist=16)
    out = sim.ivf_topk(
        emb, queries, k=5, nlist=16, nprobe=6, centroids=cents
    )
    return out.select(
        "query_id",
        "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine_r6"),
        "rank",
    )


_SQL_ANN_RECALL_ORACLE = """
    SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS n_exact, true AS recall_ok
    FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 8)
"""


@register("lsh_ann_recall", oracle=_SQL_ANN_RECALL_ORACLE)
def q_lsh_ann_recall(spark, sf_dir):
    """Pipeline: oracle-checkable certification of the LSH ANN machinery —
    computes recall@5 per query against the exact brute-force tier *inside
    Spark* and thresholds it, so the driver hash-checks that the bucketed
    path actually recovers neighbors (per-query recall is 0.8-1.0 at this
    config/sf; the 0.35 gate fails if bucketing breaks and recall collapses
    toward the random-subset floor)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    exact = sim.brute_force_topk(emb, queries, k=5)
    approx = sim.lsh_topk(
        emb, queries, k=5, num_planes=4, multiprobe_bits=2, seed=42, dim=64
    )
    return sim.recall_vs_exact(exact, approx).select(
        "query_id",
        "n_exact",
        (F.col("recall") >= F.lit(0.35)).alias("recall_ok"),
    )


@register("ivf_ann_recall", oracle=_SQL_ANN_RECALL_ORACLE)
def q_ivf_ann_recall(spark, sf_dir):
    """Pipeline: oracle-checkable certification of the IVF ANN machinery —
    recall@5 per query vs the exact tier, thresholded (0.6-1.0 measured at
    this config/sf; 0.35 gate)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    exact = sim.brute_force_topk(emb, queries, k=5)
    cents = sim.ivf_train(emb, nlist=16, iters=1)
    approx = sim.ivf_topk(emb, queries, k=5, nlist=16, nprobe=8, centroids=cents)
    return sim.recall_vs_exact(exact, approx).select(
        "query_id",
        "n_exact",
        (F.col("recall") >= F.lit(0.35)).alias("recall_ok"),
    )


@register(
    "incremental_semantic_dedup",
    # exact tier of the persisted vector index: brute-force cosine of the
    # batch against stored + itself — SQL-replayable, restricted to pairs
    # touching the batch (same contract as incremental_dedup).
    oracle=f"""
    SELECT id_a, id_b, cosine_r6 FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_SQL_COSINE}, 6) AS cosine_r6
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cosine_r6 >= 0.4 AND (id_a % 5 = 0 OR id_b % 5 = 0)
    """,
)
def q_incremental_semantic_dedup(spark, sf_dir):
    """Pipeline: continuous-ingestion SEMANTIC dedup against the persisted
    cell-partitioned vector index (pipeline/vector_index.py) — 80% of the
    embeddings applied as batch 0, the remaining 20% deduped against
    stored + itself on the exact tier (broadcast batch over one index
    scan; the IVF tier is certified separately by
    vector_index_ann_recall + the nprobe parity tests)."""
    import tempfile

    from .pipeline.vector_index import CellVectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    idx = CellVectorIndex(spark, tempfile.mkdtemp(prefix="qafs_vx_"), nlist=8)
    idx.apply_batch(
        emb.filter(F.col("vec_id") % 5 != 0), 0, threshold=0.4, tier="exact"
    )
    # threshold=0.0 here, filter on the ROUNDED value below — the package
    # convention (embedding_neardup) so the >= cut is applied to identical
    # numbers in both engines
    pairs, _ = idx.dedup_batch(
        emb.filter(F.col("vec_id") % 5 == 0), threshold=0.0, tier="exact"
    )
    return pairs.select(
        "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine_r6")
    ).filter(F.col("cosine_r6") >= 0.4)


@register(
    "vector_index_ann",
    # search with nprobe = nlist reads every cell partition — exact
    # brute-force top-k over the stored vectors, so the standard ANN
    # oracle replays it bit-for-bit.
    oracle=f"""
    SELECT query_id, neighbor_id, cosine_r6, rank FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               round({_SQL_COSINE}, 6) AS cosine_r6,
               row_number() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY {_SQL_COSINE} DESC, b.vec_id ASC
               ) AS rank
        FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 10
    ) WHERE rank <= 5
    """,
)
def q_vector_index_ann(spark, sf_dir):
    """Pipeline: ANN serving from the persisted cell-partitioned index —
    full-probe tier (nprobe = nlist = every cell read) equals exact
    brute-force top-5; the pruned tier (nprobe < nlist) reads only the
    queries' cell partitions and is certified by vector_index_ann_recall
    (pipeline/vector_index.py:search)."""
    import tempfile

    from .pipeline.vector_index import CellVectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    idx = CellVectorIndex(spark, tempfile.mkdtemp(prefix="qafs_vx_"), nlist=8)
    idx.apply_batch(emb, 0, threshold=0.99)  # index the corpus
    out = idx.search(emb.filter(F.col("vec_id") < 10), k=5, nprobe=8)
    return out.select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine"), 6).alias("cosine_r6"), "rank",
    )


@register(
    "stream_semantic_dedup",
    # accumulated exact-tier pairs over all micro-batches = the full
    # cosine pair set (each pair lands once, when its later vector
    # arrives) — the semantic twin of stream_incremental_dedup's oracle.
    oracle=f"""
    SELECT id_a, id_b, cosine_r6 FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_SQL_COSINE}, 6) AS cosine_r6
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ) WHERE cosine_r6 >= 0.4
    """,
)
def q_stream_semantic_dedup(spark, sf_dir):
    """Streaming: embeddings arrive as 3 micro-batches through the
    exactly-once cell-partitioned vector sink
    (streaming/dedup_lsh.py:streaming_semantic_dedup, exact tier); the
    accumulated pairs log must equal the all-pairs cosine set."""
    import os
    import tempfile

    from .pipeline.vector_index import CellVectorIndex
    from .streaming.dedup_lsh import streaming_semantic_dedup

    root = tempfile.mkdtemp(prefix="qafs_vstream_")
    emb = _t(spark, sf_dir, "embeddings")
    src = _stage_stream_files(spark, emb, "vec_id", root)
    stream = (
        spark.readStream.schema("vec_id LONG, embedding ARRAY<DOUBLE>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ix_root = os.path.join(root, "ix")
    q = streaming_semantic_dedup(
        stream, ix_root, os.path.join(root, "ckpt"),
        nlist=8, threshold=0.0, tier="exact",  # filter on ROUNDED below
    )
    q.awaitTermination(300)
    return (
        CellVectorIndex(spark, ix_root, nlist=8)
        .pairs()
        .select(
            "id_a", "id_b", F.round(F.col("cosine"), 6).alias("cosine_r6")
        )
        .filter(F.col("cosine_r6") >= 0.4)
    )


@register("vector_index_ann_recall", oracle=_SQL_ANN_RECALL_ORACLE)
def q_vector_index_ann_recall(spark, sf_dir):
    """Pipeline: certification of the PRUNED vector-index probe — recall@5
    of nprobe=4 search (reading half the cell partitions, the
    ivf_ann_recall convention: synthetic embeddings are unclustered so
    expected recall ~ nprobe/nlist) vs the exact brute-force tier,
    thresholded at the standard 0.35 gate."""
    import tempfile

    from .pipeline.vector_index import CellVectorIndex

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.orderBy("vec_id").limit(8)
    exact = sim.brute_force_topk(emb, queries, k=5)
    idx = CellVectorIndex(spark, tempfile.mkdtemp(prefix="qafs_vx_"), nlist=8)
    idx.apply_batch(emb, 0, threshold=0.99)
    approx = idx.search(queries, k=5, nprobe=4)
    return sim.recall_vs_exact(exact, approx).select(
        "query_id",
        "n_exact",
        (F.col("recall") >= F.lit(0.35)).alias("recall_ok"),
    )


# ---------------------------------------------------------------------------
# Generic as-of join (operators/asof.py) vs DuckDB's native ASOF JOIN
# ---------------------------------------------------------------------------
@register(
    "asof_join",
    oracle=f"""
    WITH clicks AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
        SELECT user_id, ts, {_SQL_CENTS.format(x='arg_max(value, event_id)')} AS p_cents
        FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS ts_asof, p.p_cents AS p_cents_asof
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    """,
)
def q_asof_join(spark, sf_dir):
    """Generic as-of join: every click gets the user's most recent purchase
    at-or-before it (union + keyed-window plan — one hash shuffle, no range
    join). Oracle is DuckDB's native ASOF LEFT JOIN."""
    from .operators.asof import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(cents(F.max_by(F.col("value"), F.col("event_id"))).alias("p_cents"))
    )
    return asof_join(
        clicks, purchases, left_time="ts", right_time="ts", by=["user_id"]
    )


@register(
    "feature_multi_load",
    oracle=f"""
    WITH series AS (
        SELECT time, value FROM (
            SELECT time, value,
                   row_number() OVER (
                       PARTITION BY time
                       ORDER BY created_time DESC, event_id DESC
                   ) AS rn
            FROM ({_SQL_EVENT_SERIES})
            WHERE created_time <= time + INTERVAL 10 MINUTE
        ) WHERE rn = 1
    ),
    daily AS (
        SELECT date_trunc('day', time) AS time,
               CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS cents,
               count(*) AS n
        FROM series GROUP BY 1
    ),
    grid AS (
        SELECT TIMESTAMP '2024-01-03 00:00:00' + CAST(unnest(range(0, 25)) AS BIGINT)
               * INTERVAL 1 DAY AS time
    ),
    allt AS (SELECT time FROM grid UNION SELECT time FROM daily
             WHERE time <= TIMESTAMP '2024-01-27 00:00:00'),
    filled AS (
        SELECT a.time,
               last_value(d.cents IGNORE NULLS) OVER w AS cents,
               last_value(d.n IGNORE NULLS) OVER w AS n
        FROM allt a LEFT JOIN daily d USING (time)
        WINDOW w AS (ORDER BY a.time ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT time, cents, n FROM filled
    WHERE time >= TIMESTAMP '2024-01-03 00:00:00'
      AND time <= TIMESTAMP '2024-01-27 00:00:00'
    """,
)
def q_feature_multi_load(spark, sf_dir):
    """End-to-end #2: TWO features (time-travel-filtered daily aggregates)
    ingested through the store, loaded together on a daily grid — exercises
    multi-feature outer alignment with per-feature as-of carry through the
    registry-driven path, vs a directly-computed SQL golden."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_multi_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        fs.create_feature("bench/cents", check=Column(int))
        fs.create_feature("bench/n", check=Column(int))
        # daily aggregates of the LWW'd + time-travelled series, saved as
        # two features with per-day timestamps and matching created_time
        series = last_write_wins(
            time_travel_filter(_event_series_df(spark, sf_dir), "10min"),
            value_cols=["value"],
            tiebreak_cols=["event_id"],
        )
        daily = series.groupBy(
            F.date_trunc("day", F.col("time")).alias("time")
        ).agg(
            F.sum(cents(F.col("value"))).alias("bench/cents"),
            F.count(F.lit(1)).alias("bench/n"),
        )
        fs.save_df(daily)
        out = fs.load_features(
            ["bench/cents", "bench/n"],
            from_date="2024-01-03",
            to_date="2024-01-27",
            freq="1d",
        )
        result = out.select(
            "time",
            F.col("bench/cents").alias("cents"),
            F.col("bench/n").alias("n"),
        )
        return spark.createDataFrame(result.collect(), schema=result.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ---------------------------------------------------------------------------
# Deterministic sampling (pipeline extension — see pipeline/sampling.py)
# ---------------------------------------------------------------------------
def _sql_bucket(key_sql: str, seed: int = 42) -> str:
    return sp.sql_hash_bucket(key_sql, seed)


@register(
    "hash_sample",
    oracle=f"""
    SELECT doc_id, source, n_chars FROM documents
    WHERE {sp.sql_hash_bucket('doc_id')} < 1000
    """,
)
def q_hash_sample(spark, sf_dir):
    """Pipeline: deterministic 10% corpus sample keyed on md5(doc_id) —
    stable across runs/partitionings/engines (unlike df.sample), no shuffle;
    the 10% set is a strict subset of any larger rate at the same seed."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return sp.hash_sample(docs, "doc_id", 0.10)


@register(
    "stratified_sample",
    oracle=f"""
    SELECT doc_id, lang FROM documents
    WHERE {sp.sql_hash_bucket('doc_id')} <
          CASE WHEN lang = 'zh' THEN 5000
               WHEN lang = 'fr' THEN 5000
               WHEN lang = 'en' THEN 1000
               ELSE 2000 END
    """,
)
def q_stratified_sample(spark, sf_dir):
    """Pipeline: per-language sampling rates (upweight rare langs, downweight
    the dominant one) via a CASE threshold over the same hash bucket — still
    a narrow codegen filter, no join."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return sp.stratified_sample(
        docs, "lang", "doc_id",
        fractions={"zh": 0.5, "fr": 0.5, "en": 0.1},
        default_fraction=0.2,
    )


@register(
    "train_test_split",
    oracle=f"""
    SELECT source, split, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS chars
    FROM (SELECT source, n_chars,
                 CASE WHEN {sp.sql_hash_bucket('doc_id')} < 1000
                      THEN 'test' ELSE 'train' END AS split
          FROM documents)
    GROUP BY source, split
    """,
)
def q_train_test_split(spark, sf_dir):
    """Pipeline: hash-keyed 90/10 train/test split; per-(source, split)
    doc and char counts prove the assignment is deterministic."""
    docs = _t(spark, sf_dir, "documents")
    return (
        sp.train_test_split(docs, "doc_id", test_fraction=0.10)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("chars"),
        )
    )


@register(
    "sample_per_group",
    oracle=f"""
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {sp.sql_hash_bucket('doc_id')} ASC, doc_id ASC
               ) AS rn
        FROM documents
    ) WHERE rn <= 5
    """,
)
def q_sample_per_group(spark, sf_dir):
    """Pipeline: deterministic k-per-group downsample (5 docs per source) —
    hash-ordered row_number; physical plan gets WindowGroupLimit so each
    group does a bounded top-k, not a full sort."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sp.take_per_group(docs, ["source"], "doc_id", k=5)


# ---------------------------------------------------------------------------
# Benchmark decontamination (pipeline extension — see pipeline/decontam.py)
# ---------------------------------------------------------------------------
@register(
    "decontam_hits",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(
                    t[CAST(i AS INTEGER):CAST(i AS INTEGER)+3], ' ')), 1, 8)
               )::BIGINT AS g
        FROM tok, UNNEST(range(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 4
    ),
    bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
    SELECT doc_id, hits FROM (
        SELECT doc_id, count(*) AS hits
        FROM grams WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bg)
        GROUP BY doc_id
    )
    """,
)
def q_decontam_hits(spark, sf_dir):
    """Pipeline: benchmark decontamination — training docs sharing word
    4-grams with the eval slice (doc_id % 97 = 0 stands in for a benchmark;
    n is a parameter, 13 in production). Eval n-gram set is broadcast; the
    corpus is never shuffled, only the per-doc hit count aggregates."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return dc.ngram_hits(corpus, bench, "text", "doc_id", n=4)


@register(
    "decontam_attribution",
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(
                    t[CAST(i AS INTEGER):CAST(i AS INTEGER)+3], ' ')), 1, 8)
               )::BIGINT AS g
        FROM tok, UNNEST(range(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 4
    ),
    pairs AS (
        SELECT c.doc_id, b.doc_id AS bench_doc_id, count(*) AS shared
        FROM grams c JOIN grams b USING (g)
        WHERE c.doc_id % 97 <> 0 AND b.doc_id % 97 = 0
        GROUP BY 1, 2
    )
    SELECT doc_id, bench_doc_id, shared AS shared_grams FROM (
        SELECT doc_id, bench_doc_id, shared,
               row_number() OVER (
                   PARTITION BY doc_id ORDER BY shared DESC, bench_doc_id ASC
               ) AS rn
        FROM pairs
    ) WHERE rn = 1
    """,
)
def q_decontam_attribution(spark, sf_dir):
    """Pipeline: contamination attribution — for each contaminated doc,
    the benchmark doc it shares the most 4-grams with (ties → smallest
    bench id). The diagnostics companion to decontam_hits: per-(doc,
    bench) counts aggregate map-side off a broadcast of the benchmark's
    (gram, id) pairs; the per-doc argmax is a window-free max(struct)
    partial aggregate (pipeline/decontam.py:contamination_attribution)."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return dc.contamination_attribution(corpus, bench, "text", "doc_id", n=4)


@register(
    "bloom_decontam",
    # Exact-membership oracle: the Bloom stage is a lossless PREFILTER (no
    # false negatives; the verify join removes false positives), so the
    # query's final semantics are plain n-gram decontamination — the oracle
    # needs no Bloom arithmetic at all.
    oracle="""
    WITH tok AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    grams AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(
                    t[CAST(i AS INTEGER):CAST(i AS INTEGER)+4], ' ')), 1, 8)
               )::BIGINT AS g
        FROM tok, UNNEST(range(1, len(t) - 3)) AS u(i)
        WHERE len(t) >= 5
    ),
    bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 89 = 0)
    SELECT doc_id, hits FROM (
        SELECT doc_id, count(*) AS hits
        FROM grams WHERE doc_id % 89 <> 0 AND g IN (SELECT g FROM bg)
        GROUP BY doc_id
    )
    """,
)
def q_bloom_decontam(spark, sf_dir):
    """Pipeline: Bloom-prefiltered decontamination (word 5-grams, doc_id %
    89 as the eval slice) — the 100 TB path when the benchmark gram set
    outgrows broadcast limits: a fixed-size Bloom bitmap broadcasts
    instead, the corpus is prefiltered map-side with zero false negatives,
    and only the surviving candidates reach the exact-membership join
    (pipeline/decontam.py:bloom_ngram_hits). Output is exact, so its
    oracle is the plain membership SQL."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 89 != 0)
    bench = docs.filter(F.col("doc_id") % 89 == 0)
    return dc.bloom_ngram_hits(
        corpus, bench, "text", "doc_id", n=5, m_bits=1 << 20, k=4
    )


# ---------------------------------------------------------------------------
# More TPC-H shapes: q10 (top-k group agg), q14 (broadcast-join conditional
# agg), q18 (having-filtered semi join), q19-ish (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------
@register(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name, revenue_cents, n_name FROM (
        SELECT c_custkey, any_value(c_name) AS c_name,
               CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')})
                    AS BIGINT) AS revenue_cents,
               any_value(n_name) AS n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= DATE '1996-01-01' AND o_orderdate < DATE '1996-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey
    ) ORDER BY revenue_cents DESC, c_custkey ASC LIMIT 20
    """,
)
def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10: returned-item revenue, top 20 customers. Dims (customer,
    nation) broadcast; only the orders⋈lineitem fact join shuffles; the
    top-k is a TakeOrderedAndProject, never a full sort. Integer-cents +
    custkey tiebreak make the top-20 set engine-deterministic."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-04-01"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey")
        .agg(
            F.any_value(F.col("c_name")).alias("c_name"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents"),
            F.any_value(F.col("n_name")).alias("n_name"),
        )
        .orderBy(F.col("revenue_cents").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q14",
    oracle=f"""
    SELECT CAST(sum(CASE WHEN p_type = 'PROMO'
                    THEN {_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')}
                    ELSE 0 END) AS BIGINT) AS promo_cents,
           CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')})
                AS BIGINT) AS total_cents
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= DATE '1996-03-01' AND l_shipdate < DATE '1996-04-01'
    """,
)
def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14: promo revenue share. part is a broadcast dim (no shuffle
    of lineitem); the month filter reaches the Parquet scan; the ratio's
    numerator/denominator returned as exact integer cents."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    p = _t(spark, sf_dir, "part")
    rev = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0))
            .alias("promo_cents"),
            F.sum(rev).alias("total_cents"),
        )
    )


@register(
    "tpch_q18",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_orderdate,
           CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
           CAST(sum(l_quantity) AS BIGINT) AS sum_qty
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
    GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
    """,
)
def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18: large-volume orders. The HAVING subquery is a self-agg of
    lineitem whose survivors are few → broadcast left-semi back onto the
    fact; map-side partial aggs on both groupBys."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").join(
        F.broadcast(big), F.col("o_orderkey") == big.l_orderkey, "left_semi"
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("sum_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            F.round(F.col("o_totalprice") * 100).cast("long").alias("total_cents"),
            "sum_qty",
        )
    )


@register(
    "tpch_q19",
    oracle=f"""
    SELECT CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')})
                AS BIGINT) AS revenue_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
)
def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape (adapted to the slim part schema): disjunction of
    brand/size/quantity conjunctions over a broadcast part join. Catalyst
    extracts the common l_quantity bounds (CNF factoring) so a derived
    range predicate still reaches the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & (q >= 20) & (q <= 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents")
        )
    )


@register(
    "tpch_q7",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume_cents) AS BIGINT) AS revenue_cents
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')} AS volume_cents
        FROM supplier, lineitem, orders, customer, nation n1, nation n2
        WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
          AND c_custkey = o_custkey
          AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <= TIMESTAMP '1997-12-31 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping, nation names adapted to the
    synthetic data): lineitem joins orders on the shuffle key, every
    dimension (supplier+nation, customer+nation) broadcasts, and the
    nation-pair disjunction is applied post-join. One fact-fact shuffle,
    final groupBy over a handful of (nation, nation, year) keys."""
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(pd.Timestamp("1996-01-01")))
        & (F.col("l_shipdate") <= F.lit(pd.Timestamp("1997-12-31")))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    supp = s.join(F.broadcast(n1), s.s_nationkey == F.col("s_nkey"))
    cust = c.join(F.broadcast(n2), c.c_nationkey == F.col("c_nkey"))
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("revenue_cents")
        )
    )


@register(
    "tpch_q8",
    oracle=f"""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume_cents
                         ELSE 0 END) AS BIGINT) AS nation_cents,
           CAST(sum(volume_cents) AS BIGINT) AS total_cents
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               {_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')} AS volume_cents,
               n2.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2,
             region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
          AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <= TIMESTAMP '1997-12-31 00:00:00'
    ) GROUP BY o_year
    """,
)
def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (market share, adapted): integer-cents numerator and
    denominator returned separately so the oracle hash is exact (a double
    division would accumulate differently across engines). All five
    dimension sides broadcast; lineitem-orders is the only real shuffle."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(pd.Timestamp("1996-01-01")))
        & (F.col("o_orderdate") <= F.lit(pd.Timestamp("1997-12-31")))
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cust = c.join(F.broadcast(n1), c.c_nationkey == F.col("c_nkey")).join(
        F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey")
    )
    supp = s.join(F.broadcast(n2), s.s_nationkey == F.col("s_nkey"))
    vol = cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0))
            ).alias("nation_cents"),
            F.sum(vol).alias("total_cents"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H decorrelation / anti-join shapes (round-2 additions)
# ---------------------------------------------------------------------------
@register(
    "tpch_q13",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
        SELECT c_custkey, count(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13: customer order-count distribution (the o_comment NOT LIKE
    filter becomes a priority exclusion on the synthetic schema).

    Scale shape: instead of left-outer-joining full orders rows onto
    customer (which shuffles the whole fact), pre-aggregate orders to one
    count per custkey (map-side combine), then outer-join the tiny count
    table; the second agg runs over <=|customer| keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    per_cust = c.join(
        counts, c.c_custkey == counts.o_custkey, "left_outer"
    ).select(F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17",
    oracle="""
    WITH pq AS (
        SELECT l_partkey AS pq_partkey,
               sum(CAST(l_quantity AS BIGINT)) AS sum_q, count(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
                  JOIN pq ON pq_partkey = p_partkey
    WHERE p_brand = 'Brand#1' AND p_type = 'ECONOMY'
      AND 5 * CAST(l_quantity AS BIGINT) * cnt < sum_q
    """,
)
def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17: small-quantity lines of a brand/type vs 20% of the
    part's average quantity (correlated avg subquery, hand-decorrelated).

    Exactness: l_quantity is integer-valued, so `l_q < 0.2 * avg(q)` is
    evaluated as `5 * l_q * cnt < sum_q` — pure integer arithmetic, no
    float-boundary risk between engines.

    Scale shape: the selected parts are tiny -> broadcast-semi-filter
    lineitem FIRST, so the per-part avg aggregates only the surviving
    parts' lines (not the full fact), and the avg side re-joins broadcast."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_type") == "ECONOMY")
    )
    pk = p.select("p_partkey")
    li_sel = li.join(F.broadcast(pk), li.l_partkey == pk.p_partkey, "left_semi")
    pq = li_sel.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_q"),
        F.count(F.lit(1)).alias("cnt"),
    )
    j = li_sel.join(
        F.broadcast(pq), F.col("l_partkey") == F.col("pq_partkey")
    ).filter(
        5 * F.col("l_quantity").cast("long") * F.col("cnt") < F.col("sum_q")
    )
    return j.agg(
        F.sum(cents(F.col("l_extendedprice"))).alias("total_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


@register(
    "tpch_q21",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
    GROUP BY s_name
    """,
)
def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21: suppliers who kept a finished multi-supplier order
    waiting alone ("late" = shipped >30 days after order date, the
    synthetic schema's l_receiptdate/l_commitdate stand-in).

    Scale shape: the EXISTS + NOT EXISTS pair is hand-decorrelated into
    per-order window aggregates (distinct suppliers, distinct late
    suppliers) over ONE shuffle on l_orderkey — no self-join, the fact
    table is scanned and exchanged exactly once. A late line qualifies iff
    its order has >1 supplier and exactly 1 late one."""
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    li_o = li.join(o, li.l_orderkey == o.o_orderkey).withColumn(
        "is_late", F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 30)
    )
    w = Window.partitionBy("l_orderkey")
    waiting = (
        li_o.withColumn(
            "n_supp", F.size(F.collect_set("l_suppkey").over(w))
        )
        .withColumn(
            "n_late_supp",
            F.size(
                F.collect_set(
                    F.when(F.col("is_late"), F.col("l_suppkey"))
                ).over(w)
            ),
        )
        .filter(
            F.col("is_late") & (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
        )
    )
    s = _t(spark, sf_dir, "supplier")
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q2",
    oracle="""
    WITH ps AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ),
    eu AS (
        SELECT s_suppkey, s_name, s_acctbal, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT CAST(round(s_acctbal * 100) AS BIGINT) AS acctbal_cents,
           s_name, n_name, p_partkey, p_name
    FROM part, ps, eu
    WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      AND p_size = 15 AND p_type = 'SMALL'
      AND s_acctbal = (SELECT min(eu2.s_acctbal)
                       FROM ps ps2 JOIN eu eu2 ON eu2.s_suppkey = ps2.l_suppkey
                       WHERE ps2.l_partkey = p_partkey)
    """,
)
def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape: per-part minimum-acctbal EUROPE supplier (the
    partsupp table does not exist in the synthetic schema — "supplies part"
    derives from distinct lineitem (partkey, suppkey) pairs; min acctbal
    stands in for min supplycost). Ties at the min are all returned, as in
    the reference query.

    Exactness: the correlated min compares a stored double against the min
    of stored doubles — bit-identical across engines, no arithmetic.

    Scale shape: selected parts broadcast-semi-filter lineitem before the
    distinct (the expensive step shrinks from |lineitem| to the selected
    parts' lines); the correlated min decorrelates into a partkey window
    over that small candidate set; supplier x nation x region broadcasts."""
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    ).select("p_partkey", "p_name")
    li = _t(spark, sf_dir, "lineitem")
    ps = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == p.p_partkey, "left_semi")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = _t(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    eu = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    j = (
        ps.join(F.broadcast(eu), ps.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(p), ps.l_partkey == p.p_partkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        j.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select(
            cents(F.col("s_acctbal")).alias("acctbal_cents"),
            "s_name", "n_name", "p_partkey", "p_name",
        )
    )


@register(
    "tpch_q22",
    oracle="""
    WITH cust AS (
        SELECT c_custkey, c_name,
               CAST(round(c_acctbal * 100) AS BIGINT) AS cb, c_acctbal
        FROM customer
    ),
    stats AS (
        SELECT sum(cb) AS sum_cb, count(*) AS cnt FROM cust WHERE c_acctbal > 0.0
    )
    SELECT substr(c_name, 17, 2) AS cntrycode,
           count(*) AS numcust,
           CAST(sum(cb) AS BIGINT) AS totacctbal_cents
    FROM cust, stats
    WHERE cb * cnt > sum_cb
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    GROUP BY 1
    """,
)
def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, grouped by pseudo country code (last two digits of c_name —
    the synthetic schema has no c_phone; "no orders at all" would match
    almost nobody here, so the anti-join window is orders since 2000).

    Exactness: `c_acctbal > avg(...)` evaluates as `cb * cnt > sum_cb` in
    integer cents — no float-average boundary risk.

    Scale shape: the global average is a 1-row broadcast; recent customers
    pre-aggregate to distinct custkeys (map-side combine) before the
    anti-join; no row multiplication anywhere."""
    c = _t(spark, sf_dir, "customer").withColumn("cb", cents(F.col("c_acctbal")))
    stats = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum("cb").alias("sum_cb"), F.count(F.lit(1)).alias("cnt")
    )
    active = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(pd.Timestamp("2000-01-01")))
        .select("o_custkey")
        .distinct()
    )
    rich = c.crossJoin(F.broadcast(stats)).filter(
        F.col("cb") * F.col("cnt") > F.col("sum_cb")
    )
    return (
        rich.join(active, rich.c_custkey == active.o_custkey, "left_anti")
        .groupBy(F.substring("c_name", 17, 2).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum("cb").alias("totacctbal_cents"),
        )
    )


@register(
    "tpch_q9",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_SQL_CENTS.format(
               x='(l_extendedprice * (1 - l_discount) - p_retailprice * l_quantity)')})
               AS BIGINT) AS profit_cents
    FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE 'red%'
    GROUP BY 1, 2
    """,
)
def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape: product-line profit by supplier nation and order year
    (no partsupp in the synthetic schema — part retail price stands in for
    supply cost; 'red%' parts stand in for '%green%').

    Scale shape: part (name-filtered), supplier and nation broadcast; the
    only big join is lineitem x orders on orderkey (shuffle, AQE-planned);
    the groupBy is map-side combined over ~nations x years keys."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey", "p_retailprice"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(cents(amount)).alias("profit_cents"))
    )


@register(
    "tpch_q11",
    oracle=f"""
    WITH nat AS (
        SELECT l_partkey,
               CAST(sum({_SQL_CENTS.format(x='l_extendedprice')}) AS BIGINT) AS value_cents
        FROM lineitem
          JOIN supplier ON s_suppkey = l_suppkey
          JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY l_partkey
    )
    SELECT l_partkey AS partkey, value_cents
    FROM nat, (SELECT sum(value_cents) AS total_cents FROM nat)
    WHERE value_cents * 1000 > total_cents
    """,
)
def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape: value concentration — parts whose single-nation
    shipped value exceeds 0.1% of that nation's total (partsupp value
    becomes shipped lineitem value in the synthetic schema).

    Exactness: the HAVING-vs-global-scalar comparison is evaluated as
    `value_cents * 1000 > total_cents` — pure integer arithmetic.

    Scale shape: nation's suppliers broadcast; one map-side-combined agg by
    partkey; the global total is a 1-row broadcast over the agg (the agg is
    NOT recomputed: Spark reuses the shuffle via ReusedExchange)."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select(
        "n_nationkey"
    )
    nat_s = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select("s_suppkey")
    per_part = (
        li.join(F.broadcast(nat_s), li.l_suppkey == nat_s.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(cents(F.col("l_extendedprice"))).alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select("partkey", "value_cents")
    )


@register(
    "tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_SQL_CENTS.format(x='l_extendedprice * (1 - l_discount)')})
                   AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_cents
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_cents = (SELECT max(total_cents) FROM revenue)
    """,
)
def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15: top supplier by quarterly revenue (the view + scalar max
    subquery). Integer-cents revenue makes the max-equality exact; ties all
    return, per the reference query.

    Scale shape: one map-side-combined agg by suppkey; the max is a 1-row
    broadcast; supplier dim broadcasts onto the (tiny) winner set."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(pd.Timestamp("1996-01-01")))
        & (F.col("l_shipdate") < F.lit(pd.Timestamp("1996-04-01")))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
            "total_cents"
        )
    )
    mx = revenue.agg(F.max("total_cents").alias("mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_cents") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_cents")
    )


@register(
    "tpch_q16",
    oracle="""
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape: distinct supplier counts per part attribute bucket,
    excluding blacklisted suppliers (negative balance stands in for the
    complaints-comment filter; "supplies part" derives from lineitem).

    Scale shape: the blacklist is a broadcast anti-join; part attrs
    broadcast onto the fact; count(DISTINCT) shuffles (attrs, suppkey)
    pre-deduplicated by the partial aggregate."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin([1, 4, 9, 16, 25, 36, 49])
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier JOIN nation ON n_nationkey = s_nationkey
    WHERE n_name = 'NATION_3'
      AND s_suppkey IN (
          SELECT l_suppkey
          FROM lineitem JOIN part ON p_partkey = l_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
          GROUP BY l_suppkey, l_partkey
          HAVING sum(l_quantity) > 30
      )
    """,
)
def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape: suppliers in a nation who moved heavy volume of a
    'red' part in 1996 (partsupp availqty > half-year-demand becomes
    shipped-quantity > 30 — the nested semi-join chain is the point).

    Scale shape: red parts broadcast into the fact scan; the per
    (supplier, part) agg is map-side combined; the surviving supplier set
    is tiny -> broadcast semi-join onto the (broadcast nation-filtered)
    supplier dim. l_quantity is integer-valued so the HAVING is exact."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(pd.Timestamp("1996-01-01")))
        & (F.col("l_shipdate") < F.lit(pd.Timestamp("1997-01-01")))
    )
    red = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select(
        "p_partkey"
    )
    heavy = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey, "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("q"))
        .filter(F.col("q") > 30)
        .select("l_suppkey")
        .distinct()
    )
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3").select(
        "n_nationkey"
    )
    s = _t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == n.n_nationkey
    )
    return s.join(
        F.broadcast(heavy), s.s_suppkey == heavy.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Text: within-doc repetition + corpus vocabulary (round-2 additions)
# ---------------------------------------------------------------------------
@register(
    "doc_repetition",
    oracle="""
    WITH tk AS (
        SELECT doc_id,
               CASE WHEN length(trim(text)) = 0
                    THEN CAST([] AS VARCHAR[])
                    ELSE string_split_regex(trim(text), '\\s+') END AS t
        FROM documents
    ),
    gr AS (
        SELECT doc_id, t,
               CASE WHEN len(t) < 2 THEN CAST([] AS VARCHAR[])
                    ELSE list_transform(range(1, len(t)),
                         i -> t[CAST(i AS INTEGER)] || ' ' || t[CAST(i AS INTEGER) + 1])
               END AS g
        FROM tk
    )
    SELECT doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(t)) AS BIGINT) AS distinct_tokens,
           CASE WHEN len(t) = 0 THEN 0.0
                ELSE CAST(len(t) - len(list_distinct(t)) AS DOUBLE) / len(t)
           END AS dup_token_ratio,
           CAST(len(g) AS BIGINT) AS n_grams,
           CAST(len(list_distinct(g)) AS BIGINT) AS distinct_grams,
           CASE WHEN len(g) = 0 THEN 0.0
                ELSE CAST(len(g) - len(list_distinct(g)) AS DOUBLE) / len(g)
           END AS dup_gram_ratio
    FROM gr
    """,
)
def q_doc_repetition(spark, sf_dir):
    """Pipeline: within-document repetition signals (duplicate token and
    2-gram fractions, Gopher-style) — map-only Catalyst expressions, one
    tokenize pass, no shuffle."""
    rep = tx.repetition_table(_t(spark, sf_dir, "documents"), "text", "doc_id", n=2)
    return rep.withColumnRenamed("id", "doc_id")


@register(
    "doc_top_terms",
    oracle="""
    SELECT source, token, n, rank FROM (
        SELECT source, token, count(*) AS n,
               row_number() OVER (
                   PARTITION BY source ORDER BY count(*) DESC, token ASC
               ) AS rank
        FROM (SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS token
              FROM documents WHERE length(trim(text)) > 0)
        GROUP BY source, token
    ) WHERE rank <= 10
    """,
)
def q_doc_top_terms(spark, sf_dir):
    """Pipeline: top-10 vocabulary terms per source — explode + map-side
    combined (source, token) counts + WindowGroupLimit top-k."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return tx.top_terms_by_group(docs, "text", "source", k=10)


# ---------------------------------------------------------------------------
# Interval-containment join (binned range join) — operators/interval.py
# ---------------------------------------------------------------------------
@register(
    "interval_join_clicks",
    oracle="""
    WITH purchases AS (
        SELECT user_id, event_id AS window_id, ts AS s,
               ts + INTERVAL 2 HOUR AS e
        FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
    SELECT p.window_id, p.user_id, count(*) AS n_clicks
    FROM purchases p JOIN clicks c
      ON c.user_id = p.user_id AND c.ts >= p.s AND c.ts < p.e
    GROUP BY 1, 2
    """,
)
def q_interval_join_clicks(spark, sf_dir):
    """Operator: interval-containment join — clicks landing inside each
    user's 2-hour post-purchase window, counted per window. The DuckDB
    oracle is the plain range-predicate join; the Spark plan is the binned
    equi-join (one hash shuffle on (user_id, bin), never a nested loop)."""
    from .operators.interval import interval_join

    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("start"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("end"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    joined = interval_join(
        clicks, purchases, point_time="ts", by=["user_id"], bin_width="1h"
    )
    return joined.groupBy("window_id", "user_id").agg(
        F.count(F.lit(1)).alias("n_clicks")
    )


# ---------------------------------------------------------------------------
# Multi-granularity rollup + sketch certification (round-2 additions)
# ---------------------------------------------------------------------------
@register(
    "events_rollup",
    oracle=f"""
    SELECT CAST(year(ts) AS BIGINT) AS y,
           CAST(month(ts) AS BIGINT) AS m,
           CAST(day(ts) AS BIGINT) AS d,
           count(*) AS n_events,
           CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY ROLLUP (year(ts), month(ts), day(ts))
    """,
)
def q_events_rollup(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: day -> month -> year ->
    grand total in ONE pass via GROUP BY ROLLUP — Spark's Expand produces
    the grouping sets and every level is map-side partially aggregated, so
    the cascade costs one scan + one shuffle instead of four jobs."""
    ev = _t(spark, sf_dir, "events").select(
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        "value",
    )
    return ev.rollup("y", "m", "d").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )


@register(
    "approx_distinct_users",
    # sketch certification row (pattern: lsh_ann_recall): the HLL estimate
    # itself is approximate so it can't hash-match — but its exact
    # counterpart and a relative-error bound can. rsd=0.02 -> |err| far
    # below the 10% gate unless the sketch path breaks.
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_exact, true AS within_10pct
    FROM events GROUP BY event_type
    """,
)
def q_approx_distinct_users(spark, sf_dir):
    """Sketches: HyperLogLog++ distinct users per event type, certified
    against the exact distinct count computed in the same aggregate —
    the driver hash-checks the exact value AND that the sketch landed
    within 10%. At 100 TB the sketch is the only viable path (fixed-size
    state vs a distinct shuffle); the certification keeps it honest."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_approx"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    err_ok = (
        F.abs(F.col("n_approx") - F.col("n_exact")).cast("double")
        <= F.col("n_exact").cast("double") * 0.10
    )
    return agg.select("event_type", "n_exact", err_ok.alias("within_10pct"))


# ---------------------------------------------------------------------------
# End-to-end curation pipeline (pipeline/curation.py)
# ---------------------------------------------------------------------------
@register(
    "curation_pipeline",
    oracle=f"""
    WITH corpus AS (
        SELECT doc_id, text, source FROM documents WHERE doc_id % 97 <> 0
    ),
    signals AS (
        SELECT doc_id, text, source,
               {_SQL_NTOK} AS n, {_SQL_SW_RATIO} AS sw,
               {_SQL_PUNCT_RATIO} AS pr, {_SQL_MWL} AS mwl
        FROM corpus
    ),
    good AS (
        SELECT doc_id, text, source FROM signals
        WHERE (((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0
                      WHEN n = 0 THEN 0.0 ELSE 0.5 END * 0.3)
                + (CASE WHEN sw >= 0.05 THEN 1.0 ELSE sw * 20.0 END * 0.3))
               + ((1.0 - least(pr * 2.0, 1.0)) * 0.2))
              + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END * 0.2)
              >= 0.75
    ),
    uniq AS (
        SELECT doc_id, text, source FROM good
        WHERE doc_id IN (SELECT min(doc_id) FROM good GROUP BY md5(text))
    ),
    sh AS (
        SELECT doc_id, h, count(*) OVER (PARTITION BY doc_id) AS n_sh FROM (
            SELECT DISTINCT doc_id,
                   ('0x' || substr(md5(t[CAST(i AS INTEGER)] || ' ' ||
                                       t[CAST(i AS INTEGER)+1] || ' ' ||
                                       t[CAST(i AS INTEGER)+2]), 1, 8))::BIGINT AS h
            FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM uniq WHERE length(trim(text)) > 0),
                 UNNEST(range(1, len(t) - 1)) AS u(i)
            WHERE len(t) >= 3
        )
    ),
    dupes AS (
        SELECT DISTINCT id_b FROM (
            SELECT b.doc_id AS id_b,
                   CAST(count(*) AS DOUBLE)
                   / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE)
                   AS jaccard
            FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ) WHERE jaccard >= 0.5
    ),
    neat AS (
        SELECT * FROM uniq WHERE doc_id NOT IN (SELECT id_b FROM dupes)
    ),
    grams4 AS (
        SELECT DISTINCT doc_id,
               ('0x' || substr(md5(array_to_string(
                    t[CAST(i AS INTEGER):CAST(i AS INTEGER)+3], ' ')), 1, 8)
               )::BIGINT AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM neat WHERE length(trim(text)) > 0),
             UNNEST(range(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 4
    ),
    bg AS (
        SELECT DISTINCT
               ('0x' || substr(md5(array_to_string(
                    t[CAST(i AS INTEGER):CAST(i AS INTEGER)+3], ' ')), 1, 8)
               )::BIGINT AS g
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents WHERE doc_id % 97 = 0 AND length(trim(text)) > 0),
             UNNEST(range(1, len(t) - 2)) AS u(i)
        WHERE len(t) >= 4
    ),
    dirty AS (
        SELECT DISTINCT doc_id FROM grams4 WHERE g IN (SELECT g FROM bg)
    )
    SELECT doc_id, source FROM neat
    WHERE doc_id NOT IN (SELECT doc_id FROM dirty)
      AND (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))::BIGINT
           % 10000) < 5000
    """,
)
def q_curation_pipeline(spark, sf_dir):
    """Pipeline showcase: the COMPLETE curation chain — quality filter →
    exact dedup → near-dup drop → benchmark decontamination → hash
    downsample — as one lazy Spark plan, hash-matched stage-for-stage
    against the SQL replay (doc_id % 97 = 0 plays the benchmark)."""
    from .pipeline.curation import curate

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    out = curate(
        corpus, bench,
        quality_threshold=0.75, ngram_n=3, jaccard_threshold=0.5,
        decontam_n=4, sample_fraction=0.5, seed=42,
        # Explicit exact mode (same rationale as ngram_jaccard /
        # minhash_lsh_dedup / dedup_clusters): the oracle replays UNGUARDED
        # near-dup pairs, so the default "auto" df cap must be off here or
        # query and oracle would diverge on any fixture whose hottest
        # shingle crosses the auto threshold. The guarded chain is what
        # production uses; ngram_jaccard_capped certifies the guard itself.
        max_doc_frac=None,
    )
    return out.select("doc_id", "source")


@register(
    "value_quantiles",
    # exact interpolated percentiles hash-match across engines (same
    # standard (1-g)*lower + g*upper definition); the t-digest approx tier
    # rides along as a certified boolean (pattern: approx_distinct_users).
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS med_r6,
           round(quantile_cont(value, 0.9), 6) AS p90_r6,
           true AS approx_within_5pct
    FROM events GROUP BY event_type
    """,
)
def q_value_quantiles(spark, sf_dir):
    """Sketches: exact interpolated median/p90 per event type (hash-matched
    vs DuckDB quantile_cont) + approx_percentile certified within 5% in the
    same aggregate. At 100 TB the exact percentile is a full sort per group
    — the t-digest sketch is the scale path, and the certification row
    keeps it honest."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med_r6"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_r6"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("_amed"),
        F.expr("percentile(value, 0.5)").alias("_med"),
    )
    ok = F.abs(F.col("_amed") - F.col("_med")) <= F.abs(F.col("_med")) * 0.05
    return agg.select(
        "event_type", "med_r6", "p90_r6", ok.alias("approx_within_5pct")
    )


# ---------------------------------------------------------------------------
# Window frames / pivot / set ops (§2.4-2.7 breadth)
# ---------------------------------------------------------------------------
@register(
    "trailing_avg",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(sum({_SQL_CENTS.format(x='value')}) OVER w AS BIGINT) AS trail_cents,
           count(*) OVER w AS trail_n
    FROM events
    WHERE user_id < 50
    WINDOW w AS (
        -- ordered on WHOLE SECONDS to match Spark's numeric range frame
        -- (timestamp cast to long truncates to seconds); sub-second
        -- precision would make the two engines disagree on events within
        -- a fraction of a second of the 1h boundary
        PARTITION BY user_id ORDER BY date_trunc('second', ts)
        RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
    )
    """,
)
def q_trailing_avg(spark, sf_dir):
    """Range-frame window: per-user trailing 1-hour sum/count over event
    time — the time-series moving aggregate. Spark's RANGE frame needs a
    numeric ordering key, so ts casts to epoch seconds (exact) and the
    frame is [-3600, 0]; one hash shuffle by user, no self-join."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(cents(F.col("value"))).over(w).alias("trail_cents"),
        F.count(F.lit(1)).over(w).alias("trail_n"),
    )


@register(
    "event_type_pivot",
    oracle=f"""
    SELECT date_trunc('day', ts) AS day,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
    FROM events GROUP BY 1
    """,
)
def q_event_type_pivot(spark, sf_dir):
    """Pivot: daily counts per event type as columns. Explicit pivot values
    keep it a single-pass conditional aggregation (no extra distinct-values
    job, map-side combined) — same plan the oracle's CASE form produces."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["click", "view", "purchase", "signup", "error"])
    )


@register(
    "clickers_not_buyers",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'click'
    EXCEPT
    SELECT user_id FROM events
    WHERE event_type = 'purchase' AND ts >= TIMESTAMP '2024-01-26 00:00:00'
    """,
)
def q_clickers_not_buyers(spark, sf_dir):
    """Set ops: users who clicked but made no RECENT purchase — EXCEPT
    (distinct) compiles to map-side-deduplicated aggregates feeding a
    left-anti hash join; no row multiplication."""
    ev = _t(spark, sf_dir, "events")
    clickers = ev.filter(F.col("event_type") == "click").select("user_id")
    buyers = ev.filter(
        (F.col("event_type") == "purchase")
        & (F.col("ts") >= F.lit(pd.Timestamp("2024-01-26")))
    ).select("user_id")
    return clickers.subtract(buyers)


@register(
    "bucket_centroids",
    # centroid components aggregate in integer MICRO-units: a float avg's
    # value depends on partition summation order (last-ulp nondeterminism
    # across cluster layouts); round(x*1e6) sums are exact and the final
    # division of identical integers is bit-identical in any engine.
    oracle="""
    SELECT CAST(vec_id % 10 AS BIGINT) AS bucket,
           CAST(u.i - 1 AS BIGINT) AS dim,
           CAST(sum(CAST(round(CAST(embedding[CAST(u.i AS INTEGER)] AS DOUBLE) * 1000000)
                    AS BIGINT)) AS BIGINT) AS sum_micro,
           count(*) AS n
    FROM embeddings, UNNEST(range(1, 65)) AS u(i)
    GROUP BY 1, 2
    """,
)
def q_bucket_centroids(spark, sf_dir):
    """Vector aggregation: per-bucket centroid components of the embedding
    column via posexplode + groupBy (bucket, dim) — the distributed
    mean-vector shape IVF training uses. Map-side combine reduces the
    shuffle to n_buckets x dim keys regardless of corpus size; no Python,
    no VectorUDT, plain codegen arithmetic. Components aggregate in exact
    integer micro-units (order-independent; see oracle comment)."""
    emb = _t(spark, sf_dir, "embeddings")
    comp = emb.select(
        (F.col("vec_id") % 10).cast("long").alias("bucket"),
        F.posexplode(F.col("embedding")).alias("dim", "x"),
    )
    return comp.groupBy("bucket", F.col("dim").cast("long").alias("dim")).agg(
        F.sum(F.round(F.col("x").cast("double") * 1000000).cast("long")).alias(
            "sum_micro"
        ),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "topic_clusters",
    oracle=f"""
    WITH scored AS (
        SELECT a.vec_id AS id, b.cid, {_SQL_COSINE} AS cos
        FROM embeddings a CROSS JOIN
             (SELECT vec_id AS cid, embedding FROM embeddings
              WHERE vec_id < 8) b
    ),
    assign AS (
        SELECT id, cid, cos,
               row_number() OVER (
                   PARTITION BY id ORDER BY cos DESC, cid ASC
               ) AS rn
        FROM scored
    )
    SELECT CAST(cid AS BIGINT) AS cluster_id, count(*) AS n,
           CAST(sum(CAST(round(cos * 1000000) AS BIGINT)) AS BIGINT)
               AS cohesion_micro
    FROM assign WHERE rn = 1 GROUP BY cid
    """,
)
def q_topic_clusters(spark, sf_dir):
    """Pipeline: topic clustering of the embedding corpus by
    nearest-centroid cosine assignment (centroids = the 8 lowest vec_ids,
    deterministic). The centroid set inlines as literal arrays so the
    assignment is a narrow map over the scan — zero joins/shuffles until
    the k-row per-cluster rollup; cohesion aggregates in exact integer
    micro-units (pipeline/similarity.py:topic_cluster_stats)."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = [
        (r.vec_id, r.embedding)
        for r in emb.filter(F.col("vec_id") < 8)
        .select("vec_id", "embedding")
        .collect()
    ]
    out = sim.topic_cluster_stats(emb, cents)
    return out.select(
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "n",
        "cohesion_micro",
    )


# ---------------------------------------------------------------------------
# Near-dup clusters: iterative min-label propagation (pipeline/dedup.py)
# ---------------------------------------------------------------------------
# Shared oracle body for the n-gram-Jaccard near-dup cluster labels:
# exact (unguarded) 3-shingle Jaccard >= 0.5 pair graph, then the SAME 3
# unrolled min-label iterations cluster_pairs(k_iters=3) runs. Used by
# dedup_clusters (labels) and cluster_representatives (survivor pick).
_SQL_NEARDUP_LABEL_CTES = """
    sh AS (
        SELECT doc_id, h, count(*) OVER (PARTITION BY doc_id) AS n_sh FROM (
            SELECT DISTINCT doc_id,
                   ('0x' || substr(md5(t[CAST(i AS INTEGER)] || ' ' ||
                                       t[CAST(i AS INTEGER)+1] || ' ' ||
                                       t[CAST(i AS INTEGER)+2]), 1, 8))::BIGINT AS h
            FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
                  FROM documents WHERE length(trim(text)) > 0),
                 UNNEST(range(1, len(t) - 1)) AS u(i)
            WHERE len(t) >= 3
        )
    ),
    pairs AS (
        SELECT id_a, id_b FROM (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(count(*) AS DOUBLE)
                   / CAST(any_value(a.n_sh) + any_value(b.n_sh) - count(*) AS DOUBLE)
                   AS jaccard
            FROM sh a JOIN sh b ON a.h = b.h AND a.doc_id < b.doc_id
            GROUP BY a.doc_id, b.doc_id
        ) WHERE jaccard >= 0.5
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS cluster FROM edges),
    l1 AS (
        SELECT l.id, least(l.cluster, coalesce(m.n_min, l.cluster)) AS cluster
        FROM l0 l LEFT JOIN (
            SELECT e.src, min(x.cluster) AS n_min
            FROM edges e JOIN l0 x ON e.dst = x.id GROUP BY e.src
        ) m ON l.id = m.src
    ),
    l2 AS (
        SELECT l.id, least(l.cluster, coalesce(m.n_min, l.cluster)) AS cluster
        FROM l1 l LEFT JOIN (
            SELECT e.src, min(x.cluster) AS n_min
            FROM edges e JOIN l1 x ON e.dst = x.id GROUP BY e.src
        ) m ON l.id = m.src
    ),
    l3 AS (
        SELECT l.id, least(l.cluster, coalesce(m.n_min, l.cluster)) AS cluster
        FROM l2 l LEFT JOIN (
            SELECT e.src, min(x.cluster) AS n_min
            FROM edges e JOIN l2 x ON e.dst = x.id GROUP BY e.src
        ) m ON l.id = m.src
    )
"""


@register(
    "dedup_clusters",
    # the oracle unrolls the SAME 3 min-label iterations — results are
    # equal by construction whether or not propagation has converged
    oracle=f"""
    WITH {_SQL_NEARDUP_LABEL_CTES}
    SELECT id AS doc_id, cluster FROM l3
    """,
)
def q_dedup_clusters(spark, sf_dir):
    """Pipeline: near-dup CLUSTER labels — n-gram Jaccard pairs (>= 0.5)
    fed through 3 rounds of min-label propagation, the iterative
    connected-components step a dedup pipeline runs between pair
    generation and representative selection. The whole propagation unrolls
    into one lazy plan (no driver loop state)."""
    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.5,
        max_doc_frac=None,  # exact mode — the oracle replays unguarded pairs
    )
    return dd.cluster_pairs(pairs, k_iters=3).withColumnRenamed("id", "doc_id")


@register(
    "dedup_clusters_star",
    # same 3-hop label CTEs: star labels ARE the exact connected
    # components, and this fixture's components converge within 3 hops,
    # so the unrolled-propagation oracle replays them bit-for-bit (the
    # long-chain case where they differ is pinned by
    # test_cluster_pairs_star_matches_converge)
    oracle=f"""
    WITH {_SQL_NEARDUP_LABEL_CTES}
    SELECT id AS doc_id, cluster FROM l3
    """,
)
def q_dedup_clusters_star(spark, sf_dir):
    """Pipeline: near-dup CLUSTER labels via alternating large-star /
    small-star contraction (Kiveris et al., SoCC'14) — exact connected
    components in O(log n) rounds regardless of component diameter,
    where min-label propagation needs O(diameter). The scale path for
    pair graphs that can contain long transitive chains; same pair
    generation as dedup_clusters, same labels (cluster = component min
    id)."""
    pairs = dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "text", "doc_id", n=3, threshold=0.5,
        max_doc_frac=None,
    )
    return dd.cluster_pairs_star(pairs).withColumnRenamed("id", "doc_id")


@register(
    "cluster_representatives",
    # same label CTEs as dedup_clusters, then the survivor pick: highest
    # quality wins, lowest doc_id breaks ties (both engines compute the
    # quality formula term-for-term identically — quality_score is
    # hash-exact — so the argmax ordering agrees bit-for-bit).
    oracle=f"""
    WITH {_SQL_NEARDUP_LABEL_CTES},
    quality AS (
        SELECT doc_id,
               (((CASE WHEN n >= 10 AND n <= 100000 THEN 1.0
                       WHEN n = 0 THEN 0.0 ELSE 0.5 END * 0.3)
                 + (CASE WHEN sw >= 0.05 THEN 1.0 ELSE sw * 20.0 END * 0.3))
                + ((1.0 - least(pr * 2.0, 1.0)) * 0.2))
               + (CASE WHEN mwl >= 2.0 AND mwl <= 12.0 THEN 1.0 ELSE 0.3 END * 0.2)
               AS quality
        FROM (
            SELECT doc_id,
                   {_SQL_NTOK} AS n,
                   {_SQL_SW_RATIO} AS sw,
                   {_SQL_PUNCT_RATIO} AS pr,
                   {_SQL_MWL} AS mwl
            FROM documents
        )
    )
    SELECT cluster, id AS rep_doc_id, quality AS rep_quality, n_members
    FROM (
        SELECT l3.cluster, l3.id, q.quality,
               CAST(count(*) OVER (PARTITION BY l3.cluster) AS BIGINT)
                   AS n_members,
               row_number() OVER (PARTITION BY l3.cluster
                                  ORDER BY q.quality DESC, l3.id ASC) AS rn
        FROM l3 JOIN quality q ON l3.id = q.doc_id
    ) WHERE rn = 1
    """,
)
def q_cluster_representatives(spark, sf_dir):
    """Pipeline: quality-aware SURVIVOR SELECTION — the step between
    near-dup clustering and the final keep-list. Naive dedup keeps an
    arbitrary member of each near-dup cluster (lowest id, first seen); a
    curation pipeline should keep the BEST one. Composition of two green
    operators: cluster labels (ngram_jaccard_pairs exact → cluster_pairs,
    as dedup_clusters) joined to the per-doc quality heuristic
    (text.quality_table), then one ``max(struct(quality, -id))`` partial
    aggregate per cluster — argmax by (quality DESC, id ASC), deterministic
    under quality ties. Scale shape: the join is id-equi on the (tiny)
    clustered subset, the argmax is a map-side-combined groupBy — no
    windows over data rows, no driver loops."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, max_doc_frac=None,
    )
    labels = dd.cluster_pairs(pairs, k_iters=3)
    qual = tx.quality_table(docs, "text", "doc_id")
    joined = labels.join(qual, "id")
    best = joined.groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(
            F.struct(F.col("quality"), (-F.col("id")).alias("neg_id"))
        ).alias("_m"),
    )
    return best.select(
        "cluster",
        (-F.col("_m.neg_id")).alias("rep_doc_id"),
        F.col("_m.quality").alias("rep_quality"),
        "n_members",
    )


@register(
    "leakage_free_split",
    # same label CTEs as dedup_clusters; the split is keyed on the
    # CLUSTER (coalesced to own id for singletons) with the hash_sample
    # md5 bucket math, so both engines compute identical membership.
    oracle=f"""
    WITH {{ctes}}
    SELECT d.doc_id,
           CAST(coalesce(l3.cluster, d.doc_id) AS BIGINT) AS cluster,
           CASE WHEN {{bucket}} < 1000 THEN 'test' ELSE 'train' END AS split
    FROM documents d LEFT JOIN l3 ON l3.id = d.doc_id
    """.format(
        ctes=_SQL_NEARDUP_LABEL_CTES,
        bucket=sp.sql_hash_bucket("coalesce(l3.cluster, d.doc_id)"),
    ),
)
def q_leakage_free_split(spark, sf_dir):
    """Pipeline: train/test split with NO near-duplicate leakage — the
    near-dup cluster is the split key, so an entire duplicate group lands
    on one side atomically; singletons reproduce the plain row-hash split
    (pipeline/sampling.py:leakage_free_split). Labels run in CONVERGED
    min-label mode (the operator default): a dup chain longer than 3 hops
    cannot split across the boundary. The SQL oracle is the 3-round
    unrolled propagation (as dedup_clusters) — on this fixture the pair
    graph's components converge within 3 hops, so the oracle match also
    certifies converged == fixed-3 here; the long-chain pytest pins the
    case where they differ. The mechanism behind dedup-aware eval splits
    in the contamination literature."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, max_doc_frac=None,
    )
    return sp.leakage_free_split(docs, pairs, "doc_id", test_fraction=0.10)


# ---------------------------------------------------------------------------
# SemDeDup-style semantic dedup (pipeline/semdedup.py)
# ---------------------------------------------------------------------------
# Shared oracle body: >=0.4 cosine pair graph over embeddings, the SAME 3
# unrolled min-label iterations as cluster_pairs(k_iters=3), keep decision
# left-joined back onto every vec_id (singletons keep themselves).
_SQL_SEMDEDUP_KEEPS = f"""
    pairs AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE {_SQL_COSINE} >= 0.4
    ),
    edges AS (
        SELECT id_a AS src, id_b AS dst FROM pairs
        UNION SELECT id_b, id_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT src AS id, src AS cluster FROM edges),
    l1 AS (
        SELECT l.id, least(l.cluster, coalesce(m.n_min, l.cluster)) AS cluster
        FROM l0 l LEFT JOIN (
            SELECT e.src, min(x.cluster) AS n_min
            FROM edges e JOIN l0 x ON e.dst = x.id GROUP BY e.src
        ) m ON l.id = m.src
    ),
    l2 AS (
        SELECT l.id, least(l.cluster, coalesce(m.n_min, l.cluster)) AS cluster
        FROM l1 l LEFT JOIN (
            SELECT e.src, min(x.cluster) AS n_min
            FROM edges e JOIN l1 x ON e.dst = x.id GROUP BY e.src
        ) m ON l.id = m.src
    ),
    l3 AS (
        SELECT l.id, least(l.cluster, coalesce(m.n_min, l.cluster)) AS cluster
        FROM l2 l LEFT JOIN (
            SELECT e.src, min(x.cluster) AS n_min
            FROM edges e JOIN l2 x ON e.dst = x.id GROUP BY e.src
        ) m ON l.id = m.src
    ),
    keeps AS (
        SELECT e.vec_id AS id,
               coalesce(l.cluster, e.vec_id) AS cluster,
               coalesce(l.cluster, e.vec_id) = e.vec_id AS keep
        FROM embeddings e LEFT JOIN l3 l ON e.vec_id = l.id
    )
"""


@register(
    "semantic_dedup",
    oracle=f"""
    WITH {_SQL_SEMDEDUP_KEEPS}
    SELECT id, cluster, keep FROM keeps
    """,
)
def q_semantic_dedup(spark, sf_dir):
    """Pipeline: SemDeDup keep/drop decision at the DEFAULT tier — the
    auto-sized IVF scale tier (nlist=ceil(n/target_cell_size), nprobe=2),
    which short-circuits to the exact all-pairs path when the corpus fits
    one cell. At the gate fixtures (<=2000 embeddings < 4096) that
    short-circuit is taken, so the DuckDB oracle replays the result
    bit-for-bit; at 100 TB the same call gets cell-bounded quadratic
    work, never O(n²) — the IVF branch is certified against exact by
    `semantic_dedup_agreement`/`semantic_dedup_multiprobe`. >=0.4 cosine
    pair graph, 3-round min-label components, keep = min-id
    representative, singletons keep themselves."""
    emb = _t(spark, sf_dir, "embeddings")
    return sdd.semantic_dedup(emb, "embedding", "vec_id", threshold=0.4, k_iters=3)


@register(
    "semantic_dedup_agreement",
    # certification row (pattern: lsh_ann_recall): the IVF tier's keep-set
    # is approximate by design (cross-cell pairs are missed), so it can't
    # hash-match — but the exact tier's counts can, plus a thresholded
    # agreement boolean that fails if the cell assignment stops grouping
    # near-duplicates together.
    oracle=f"""
    WITH {_SQL_SEMDEDUP_KEEPS}
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_exact,
           true AS agreement_ok
    FROM keeps
    """,
)
def q_semantic_dedup_agreement(spark, sf_dir):
    """Pipeline: certification of the IVF-celled SemDeDup tier — Jaccard
    overlap of the exact and IVF keep-sets, computed in Spark and
    thresholded at 0.5 (measured ~0.9 at this config/sf; missed cross-cell
    pairs only ever ADD approximate keeps, so the metric degrades smoothly
    if the quantizer breaks)."""
    emb = _t(spark, sf_dir, "embeddings")
    exact = sdd.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, k_iters=3, exact=True
    )
    approx = sdd.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, k_iters=3, nlist=8
    )
    return sdd.keep_set_agreement(exact, approx)


@register(
    "semantic_dedup_multiprobe",
    # certification row (pattern: semantic_dedup_agreement): multiprobe
    # assignment (nprobe=2) can only ADD cross-cell pairs over nprobe=1 —
    # recall_monotone verifies that subset property on the actual data,
    # agreement_ok gates the nprobe=2 keep-set against exact.
    oracle=f"""
    WITH {{keeps}}
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_exact,
           true AS agreement_ok, true AS recall_monotone
    FROM keeps
    """.format(keeps=_SQL_SEMDEDUP_KEEPS),
)
def q_semantic_dedup_multiprobe(spark, sf_dir):
    """Pipeline: SemDeDup's cross-cell recall knob — both IVF tiers share
    one trained quantizer, differing only in nprobe; the nprobe=1 pair set
    must embed in the nprobe=2 set (anti-join count 0, computed
    distributed, folded in via a broadcast 1-row crossJoin), and the
    nprobe=2 keep-set must clear the same exact-tier agreement gate as
    semantic_dedup_agreement (pipeline/semdedup.py:semantic_pairs)."""
    from pyspark import StorageLevel

    from .pipeline.similarity import _probe_cells, ivf_train, norm

    emb = _t(spark, sf_dir, "embeddings")
    cents = ivf_train(
        emb, nlist=8, iters=1, data_id="vec_id", data_vec="embedding"
    )
    # Shared assignment subtree (round 17): all three quantizer branches
    # (p1, p2, approx2) re-ran the norm + centroid-scoring Arrow pass over
    # the full corpus. One persisted top-2 probe frame feeds them all:
    # _probe_cells' stable sort makes cells[0] bit-equal to
    # _cell_assigner's argmax (the documented nprobe=1 parity contract),
    # so the p1 branch derives its assignment from the SAME frame instead
    # of a third kernel run. The exact tier is untouched — its all-pairs
    # path never assigns cells.
    probes = _probe_cells(cents, 2)
    vb = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        norm(F.col("embedding")).alias("__n"),
        probes(F.col("embedding")).alias("cells"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    v1 = vb.select("id", "vec", "__n", F.col("cells")[0].alias("cell"))
    v2 = vb.select("id", "vec", "__n", F.explode("cells").alias("cell"))
    kw = dict(threshold=0.4, centroids=cents)
    p1 = sdd.semantic_pairs(
        emb, "embedding", "vec_id", nprobe=1, _assigned=v1, **kw
    )
    p2 = sdd.semantic_pairs(
        emb, "embedding", "vec_id", nprobe=2, _assigned=v2, **kw
    )
    monotone = (
        p1.select("id_a", "id_b")
        .join(p2.select("id_a", "id_b"), ["id_a", "id_b"], "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("recall_monotone"))
    )
    exact = sdd.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, k_iters=3, exact=True
    )
    approx2 = sdd.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, k_iters=3,
        centroids=cents, nprobe=2, _assigned=v2,
    )
    return sdd.keep_set_agreement(exact, approx2).crossJoin(
        F.broadcast(monotone)
    )


@register(
    "semantic_dedup_guarded",
    # certification row (pattern: semantic_dedup_agreement) for the
    # round-12 HOT-CELL sub-bucket guard: the cap is sized BELOW the
    # fixture's average cell (max(8, n//16) vs avg n//8), so
    # _self_pair_guard ENGAGES at every gate fixture (guard_engaged is
    # computed from the live occupancy, not assumed), and the guarded
    # keep-set must clear the same exact-tier agreement bar. The oracle
    # replays the exact tier's counts; the booleans gate the guard.
    oracle=f"""
    WITH {{keeps}}
    SELECT CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept_exact,
           true AS agreement_ok, true AS guard_engaged
    FROM keeps
    """.format(keeps=_SQL_SEMDEDUP_KEEPS),
)
def q_semantic_dedup_guarded(spark, sf_dir):
    """Pipeline: certification of the hot-cell sub-bucket guard
    (round 12, `similarity._self_pair_guard`) — same trained quantizer
    as the agreement tier, but `max_cell_size` sized below the average
    cell so the guard engages on the gate fixture itself: cells split
    into verified hyperplane sub-buckets with symmetric 1-bit
    multiprobe BEFORE the pair shuffle, and the resulting keep-set must
    still clear the exact-tier Jaccard bar (missed sub-bucket pairs only
    ever ADD keeps, so the metric degrades smoothly). ``guard_engaged``
    re-runs the guard DECISION (the same over-cap occupancy predicate
    `_self_pair_guard` gates on) over the same assignment — round 16
    trimmed it to just that occupancy probe: the previous full
    `_self_pair_guard` call also ran the flagged-cell means and the
    sub-bucket verify loop (3+ extra build-time jobs) only to discard
    everything but the None/not-None bit, which the occupancy count
    alone determines (the guard returns None iff no group exceeds the
    cap — its first check). Same boolean, measured ~3 s less build
    time."""
    from .pipeline.similarity import _cell_assigner, ivf_train, norm

    emb = _t(spark, sf_dir, "embeddings")
    n = emb.count()
    cap = max(8, n // 16)
    cents = ivf_train(
        emb, nlist=8, iters=1, data_id="vec_id", data_vec="embedding"
    )
    assign = _cell_assigner(cents)
    v = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("vec"),
        norm(F.col("embedding")).alias("__n"),
        assign(F.col("embedding")).alias("cell"),
    )
    engaged = bool(
        v.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > int(cap))
        .limit(1)
        .count()
        > 0
    )
    exact = sdd.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, k_iters=3, exact=True
    )
    guarded = sdd.semantic_dedup(
        emb, "embedding", "vec_id", threshold=0.4, k_iters=3,
        centroids=cents, max_cell_size=cap,
    )
    return sdd.keep_set_agreement(exact, guarded).withColumn(
        "guard_engaged", F.lit(bool(engaged))
    )


@register(
    "semantic_dedup_star_blob",
    # Hash-exact certification of the round-13 STAR pair-output bound:
    # a deterministic near-duplicate BLOB (the lexicographically-first
    # embedding replicated under the first 512 vec_ids — every pair at
    # cosine 1.0) is forced through the guard (cap 64 << 512) with
    # semantic_dedup's default pair_output="star". The star pre-pass
    # must emit exactly the min-id spanning star, so the keep/cluster
    # decision is analytic: one cluster labeled by the minimum id,
    # keep only there. The oracle derives the same frame in pure SQL —
    # a full per-row hash-exact replay of the star path, not just an
    # agreement boolean.
    oracle="""
    WITH ids AS (
        SELECT CAST(vec_id AS BIGINT) AS id FROM embeddings
        ORDER BY vec_id LIMIT 512
    ), hub AS (SELECT min(id) AS h FROM ids)
    SELECT ids.id AS id,
           hub.h AS cluster,
           ids.id = hub.h AS keep
    FROM ids, hub
    ORDER BY id
    """,
)
def q_semantic_dedup_star_blob(spark, sf_dir):
    """Pipeline: star-mode blob bound (`similarity._blob_star_split`,
    round 13) — `semantic_dedup` over a 512-row one-cell blob of
    IDENTICAL vectors with `max_cell_size=64`. Full mode would emit
    ~131k pairs here; star emits 511 hub edges, and the keep-set is the
    analytic exact-tier result (blob keeps its min id only), replayed
    per-row by the oracle. Cites the SemDeDup consumer contract: the
    dedup decision needs components, not the quadratic pair list."""
    emb = _t(spark, sf_dir, "embeddings")
    first = emb.orderBy("vec_id").limit(1).select(
        F.col("embedding").alias("emb0")
    )
    blob = (
        emb.orderBy("vec_id").limit(512)
        .select(F.col("vec_id").cast("long").alias("vec_id"))
        .crossJoin(F.broadcast(first))
        .select("vec_id", F.col("emb0").alias("embedding"))
    )
    cents = [first.first()["emb0"]]
    dec = sdd.semantic_dedup(
        blob, "embedding", "vec_id", threshold=0.9,
        centroids=cents, max_cell_size=64,
    )
    return dec.select(
        F.col("id"), F.col("cluster"), F.col("keep")
    ).orderBy("id")


# ---------------------------------------------------------------------------
# Chunking + sequence packing (pipeline/text.py, training-data prep)
# ---------------------------------------------------------------------------
@register(
    "chunk_documents",
    oracle="""
    WITH tk AS (
        SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    ch AS (
        SELECT doc_id, u.i AS chunk_idx,
               array_to_string(
                   t[(CAST(u.i AS INTEGER) * 56 + 1):(CAST(u.i AS INTEGER) * 56 + 64)],
                   ' ') AS chunk_text
        FROM tk, UNNEST(range(0,
            CASE WHEN len(t) <= 64 THEN 1
                 ELSE CAST(ceil((len(t) - 64) / 56.0) AS BIGINT) + 1 END)) AS u(i)
    )
    SELECT doc_id, CAST(chunk_idx AS INTEGER) AS chunk_idx, chunk_text,
           CAST(len(string_split_regex(chunk_text, '\\s+')) AS BIGINT) AS n_tokens
    FROM ch
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Pipeline: context-window chunking — 64-token windows, 8-token
    overlap (stride 56), tail emitted when it holds uncovered tokens.
    Tokenize-once staged projection + sequence/slice/posexplode; map-only,
    no shuffle, no Python."""
    return tx.chunk_documents(
        _t(spark, sf_dir, "documents"), "text", "doc_id",
        max_tokens=64, overlap=8,
    )


@register(
    "pack_sequences",
    oracle="""
    WITH base AS (
        SELECT doc_id,
               CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT)
                   AS n_tokens,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 8))::BIGINT
                   % 64) AS pack_key,
               md5(CAST(doc_id AS VARCHAR) || '#rank') AS r
        FROM documents
    )
    SELECT doc_id, n_tokens, pack_key,
           CAST(floor(CAST(sum(n_tokens) OVER w - n_tokens AS DOUBLE) / 256)
                AS BIGINT) AS pack_id
    FROM base
    WINDOW w AS (PARTITION BY pack_key ORDER BY r, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_pack_sequences(spark, sf_dir):
    """Pipeline: sequence packing — deterministic contiguous packing of
    docs into 256-token budget packs inside 64 md5 buckets (running-total
    window per bucket; parallel across buckets, no global sort)."""
    return tx.pack_sequences(
        _t(spark, sf_dir, "documents"), "text", "doc_id", budget=256, seed=42
    )


# ---------------------------------------------------------------------------
# Behavioral analytics: cohort retention + ordered funnel
# ---------------------------------------------------------------------------
@register(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('week', f.cohort_week, a.act_week) AS BIGINT) AS week_no,
           count(DISTINCT a.user_id) AS n_active
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Analytics: weekly cohort retention matrix — first-event cohort per
    user joined back onto distinct (user, week) activity. The firsts agg is
    small (one row per user) → broadcast onto the distinct-activity agg;
    both aggs map-side combine."""
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("act_week")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            (
                F.floor(
                    (F.col("act_week").cast("long") - F.col("cohort_week").cast("long"))
                    / (7 * 86400)
                )
            ).cast("long").alias("week_no"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "funnel_ordered",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
               min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_buy
        FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS viewed,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS then_clicked,
           CAST(sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                          AND t_buy > t_click THEN 1 ELSE 0 END) AS BIGINT)
               AS then_bought
    FROM per_user
    """,
)
def q_funnel_ordered(spark, sf_dir):
    """Analytics: strictly-ordered view -> click -> purchase funnel — the
    min-timestamp-per-stage conditional aggregation (one map-side-combined
    groupBy per user, one tiny global agg; no self-joins, no window)."""
    ev = _t(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_buy"),
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    bought = clicked & (F.col("t_buy") > F.col("t_click"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(viewed.cast("long")).alias("viewed"),
        F.sum(clicked.cast("long")).alias("then_clicked"),
        F.sum(bought.cast("long")).alias("then_bought"),
    )


# ---------------------------------------------------------------------------
# Temperature-weighted mixture sampling — pipeline/sampling.py
# ---------------------------------------------------------------------------
@register(
    "temperature_mix",
    oracle=f"""
    WITH {sp.sql_temperature_thresholds('documents', 'lang', 250)}
    SELECT d.doc_id, d.lang, d.source
    FROM documents d JOIN __t ON d.lang = __t.__grp
    WHERE {sp.sql_hash_bucket('d.doc_id')} < __t.__thr
    """,
)
def q_temperature_mix(spark, sf_dir):
    """Pipeline: temperature-(alpha=0.5) mixture resampling over languages —
    per-group thresholds from integer-exact sqrt micro-weights, broadcast
    back over a narrow hash filter (the corpus side is never shuffled)."""
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return sp.temperature_sample(docs, "lang", "doc_id", target_rows=250)


@register(
    "dsir_select",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    tb AS (SELECT doc_id, lang,
                  ('0x' || substr(md5(term), 1, 8))::BIGINT % 1024 AS b
           FROM tok),
    ct AS (SELECT b, count(*) AS nt FROM tb WHERE lang = 'en' GROUP BY 1),
    cr AS (SELECT b, count(*) AS nr FROM tb GROUP BY 1),
    tots AS (SELECT (SELECT sum(nt) FROM ct) AS tt,
                    (SELECT sum(nr) FROM cr) AS tr),
    lr AS (SELECT cr.b,
                  CAST(round(ln(
                      (CAST(COALESCE(nt, 0) + 1 AS DOUBLE)
                       * CAST(tr + 1024 AS DOUBLE))
                      / (CAST(nr + 1 AS DOUBLE) * CAST(tt + 1024 AS DOUBLE))
                  ) * 1000000) AS BIGINT) AS lr_micro
           FROM cr LEFT JOIN ct USING (b) CROSS JOIN tots),
    per_doc AS (
        SELECT doc_id, count(*) AS n_tokens, sum(lr_micro) AS weight_micro
        FROM tb JOIN lr USING (b) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, CAST(weight_micro AS BIGINT) AS weight_micro, rank
    FROM (
        SELECT doc_id, n_tokens, weight_micro,
               row_number() OVER (ORDER BY weight_micro DESC, doc_id ASC) AS rank
        FROM per_doc
    ) WHERE rank <= 50
    """,
)
def q_dsir_select(spark, sf_dir):
    """Pipeline: DSIR importance selection (Xie et al., NeurIPS 2023) —
    top-50 docs whose hashed-unigram distribution is most target-like,
    target = the English slice. Both unigram models are n_buckets-cell
    hashed tables (broadcast-able at any corpus size); per-bucket
    log-ratios freeze to integer micro-nats so per-doc scores are exact
    BIGINT sums; top-k plans as TakeOrderedAndProject, never a global sort
    (pipeline/sampling.py:dsir_select)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    target = docs.filter(F.col("lang") == "en")
    return sp.dsir_select(docs, target, "text", "doc_id", n_buckets=1024, k=50)


@register(
    "vocab_coverage",
    oracle=r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    cnt AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM cnt),
    top AS (SELECT term, n FROM cnt ORDER BY n DESC, term ASC LIMIT 100)
    SELECT term, n,
           row_number() OVER (ORDER BY n DESC, term ASC) AS rank,
           CAST(round(CAST(sum(n) OVER (ORDER BY n DESC, term ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS DOUBLE) * 1000000 / CAST(t AS DOUBLE)) AS BIGINT)
               AS cov_micro
    FROM top CROSS JOIN tot
    """,
)
def q_vocab_coverage(spark, sf_dir):
    """Pipeline: top-100 vocabulary with cumulative corpus coverage (the
    Zipf / vocab-size-selection audit before tokenizer training). One
    map-side-combined word count is the only corpus-wide shuffle; the
    top-k plans as TakeOrderedAndProject and the running-coverage window
    touches the 100 survivors only (pipeline/text.py:vocab_coverage)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return tx.vocab_coverage(docs, "text", "doc_id", k=100)


# ---------------------------------------------------------------------------
# TF-IDF top terms per document — pipeline/text.py
# ---------------------------------------------------------------------------
@register(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (SELECT doc, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1)
    SELECT doc AS doc_id, term, tf, df, rank FROM (
        SELECT tf.doc, tf.term, tf.tf, dfreq.df,
               row_number() OVER (
                   PARTITION BY tf.doc
                   ORDER BY CAST(tf.tf AS DOUBLE) / CAST(dfreq.df AS DOUBLE)
                            DESC, tf.term ASC
               ) AS rank
        FROM tf JOIN dfreq USING (term)
    ) WHERE rank <= 3
    """,
)
def q_tfidf_top_terms(spark, sf_dir):
    """Pipeline: top-3 tf-idf terms per document (raw-idf variant — the
    per-doc ranking reduces to one correctly-rounded tf/df double division,
    bit-identical across engines; ties break on the term string)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return tx.tfidf_top_terms(docs, "text", "doc_id", k=3)


# ---------------------------------------------------------------------------
# Unigram-LM NLL (perplexity proxy) — pipeline/text.py
# ---------------------------------------------------------------------------
@register(
    "unigram_logprob",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    cnt AS (SELECT term, count(*) AS n FROM tok GROUP BY 1),
    tot AS (SELECT sum(n) AS t FROM cnt),
    lp AS (SELECT term,
                  CAST(round(ln(CAST(n AS DOUBLE) / CAST(t AS DOUBLE))
                             * 1000000) AS BIGINT) AS lp
           FROM cnt, tot)
    SELECT doc AS doc_id, count(*) AS n_tokens,
           CAST(-sum(lp.lp) AS BIGINT) AS nll_micro
    FROM tok JOIN lp USING (term)
    GROUP BY doc
    """,
)
def q_unigram_logprob(spark, sf_dir):
    """Pipeline: per-doc unigram negative log-likelihood — per-term log-probs
    frozen to integer micro-nats once per vocabulary entry, then exact BIGINT
    sums per document (no float-summation-order hazards)."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return tx.unigram_logprob_table(docs, "text", "doc_id")


# ---------------------------------------------------------------------------
# BM25 ranked retrieval — pipeline/text.py
# ---------------------------------------------------------------------------
_BM25_TERMS = ("spark", "join", "window", "vector")


@register(
    "bm25_topk",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    dl AS (SELECT doc, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl),
    tf AS (SELECT doc, term, count(*) AS tf FROM tok
           WHERE term IN ('spark', 'join', 'window', 'vector')
           GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc,
               CAST(round(
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                            / (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                               / (CAST(total_tokens AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE)))))
                   * 1000000) AS BIGINT) AS s_micro
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN stats
    ),
    per_doc AS (SELECT doc, sum(s_micro) AS score_micro FROM scored GROUP BY doc)
    SELECT doc AS doc_id, CAST(score_micro AS BIGINT) AS score_micro, rank
    FROM (
        SELECT doc, score_micro,
               row_number() OVER (ORDER BY score_micro DESC, doc ASC) AS rank
        FROM per_doc
    ) WHERE rank <= 20
    """,
)
def q_bm25_topk(spark, sf_dir):
    """Pipeline: Okapi BM25 top-20 for a bag-of-terms query — inverted-index
    probe (query-term filter on the exploded stream), broadcast corpus
    scalars, per-(doc, term) partials frozen to micro-units before the exact
    per-doc BIGINT sum."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    return tx.bm25_topk(docs, "text", "doc_id", list(_BM25_TERMS), k=20)


@register(
    "bm25_index_topk",
    # identical oracle to bm25_topk: the persisted index's scoring is
    # byte-identical (same expression shapes, same micro freeze), so a
    # full-corpus index query replays the same SQL.
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    dl AS (SELECT doc, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl),
    tf AS (SELECT doc, term, count(*) AS tf FROM tok
           WHERE term IN ('spark', 'join', 'window', 'vector')
           GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc,
               CAST(round(
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                            / (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                               / (CAST(total_tokens AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE)))))
                   * 1000000) AS BIGINT) AS s_micro
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN stats
    ),
    per_doc AS (SELECT doc, sum(s_micro) AS score_micro FROM scored GROUP BY doc)
    SELECT doc AS doc_id, CAST(score_micro AS BIGINT) AS score_micro, rank
    FROM (
        SELECT doc, score_micro,
               row_number() OVER (ORDER BY score_micro DESC, doc ASC) AS rank
        FROM per_doc
    ) WHERE rank <= 20
    """,
)
def q_bm25_index_topk(spark, sf_dir):
    """Pipeline: BM25 retrieval from the PERSISTED inverted index
    (pipeline/text_index.py) — the corpus is ingested as 3 exactly-once
    batches (each document tokenized once, at ingest), then the query
    probes only its terms' prefix partitions; scoring byte-identical to
    the on-the-fly bm25_topk, so the same oracle replays it."""
    import tempfile

    from .pipeline.text_index import InvertedIndex

    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    ix = InvertedIndex(
        spark, tempfile.mkdtemp(prefix="qafs_invix_"), num_partitions=32
    )
    for kb in range(3):
        ix.apply_batch(docs.filter(F.col("doc_id") % 3 == kb), kb)
    return ix.search(list(_BM25_TERMS), k=20).select(
        F.col("doc").alias("doc_id"), "score_micro", "rank"
    )


@register(
    "stream_bm25_index",
    # same oracle as bm25_topk/bm25_index_topk: the streaming sink's index
    # is byte-identical to the batch-built one (exactly-once ingestion,
    # identical scoring).
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    dl AS (SELECT doc, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl),
    tf AS (SELECT doc, term, count(*) AS tf FROM tok
           WHERE term IN ('spark', 'join', 'window', 'vector')
           GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    scored AS (
        SELECT tf.doc,
               CAST(round(
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                            / (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                               / (CAST(total_tokens AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE)))))
                   * 1000000) AS BIGINT) AS s_micro
        FROM tf JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN stats
    ),
    per_doc AS (SELECT doc, sum(s_micro) AS score_micro FROM scored GROUP BY doc)
    SELECT doc AS doc_id, CAST(score_micro AS BIGINT) AS score_micro, rank
    FROM (
        SELECT doc, score_micro,
               row_number() OVER (ORDER BY score_micro DESC, doc ASC) AS rank
        FROM per_doc
    ) WHERE rank <= 20
    """,
)
def q_stream_bm25_index(spark, sf_dir):
    """Streaming: the corpus arrives as 3 micro-batches through the
    exactly-once inverted-index sink
    (streaming/dedup_lsh.py:streaming_inverted_index); the resulting
    index's search is byte-identical to on-the-fly BM25 over everything
    ingested."""
    import os
    import tempfile

    from .pipeline.text_index import InvertedIndex
    from .streaming.dedup_lsh import streaming_inverted_index

    root = tempfile.mkdtemp(prefix="qafs_bm25stream_")
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    src = _stage_stream_files(spark, docs, "doc_id", root)
    stream = (
        spark.readStream.schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    ix_root = os.path.join(root, "ix")
    q = streaming_inverted_index(
        stream, ix_root, os.path.join(root, "ckpt"), num_partitions=32
    )
    q.awaitTermination(300)
    return InvertedIndex(spark, ix_root, num_partitions=32).search(
        list(_BM25_TERMS), k=20
    ).select(F.col("doc").alias("doc_id"), "score_micro", "rank")


@register(
    "hybrid_retrieval",
    # RRF over the two already-proven rankings: the bm25 CTE chain (top-30)
    # fused with the exact ANN ranking for query vector 0 (top-30), each
    # contribution frozen to round(1e6/(60+rank)) — integer-exact, and no
    # rank <= 30 sits on a .5 boundary (first at 60+r = 128).
    oracle=f"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    dl AS (SELECT doc, count(*) AS dl FROM tok GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, sum(dl) AS total_tokens FROM dl),
    tfq AS (SELECT doc, term, count(*) AS tf FROM tok
            WHERE term IN ('spark', 'join', 'window', 'vector')
            GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tfq GROUP BY 1),
    scored AS (
        SELECT tfq.doc,
               CAST(round(
                   ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
                            / (CAST(df AS DOUBLE) + 0.5))
                   * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
                   / (CAST(tf AS DOUBLE)
                      + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)
                               / (CAST(total_tokens AS DOUBLE)
                                  / CAST(n_docs AS DOUBLE)))))
                   * 1000000) AS BIGINT) AS s_micro
        FROM tfq JOIN dfreq USING (term) JOIN dl USING (doc) CROSS JOIN stats
    ),
    per_doc AS (SELECT doc, sum(s_micro) AS score_micro FROM scored GROUP BY doc),
    bm AS (
        SELECT doc AS id, rank FROM (
            SELECT doc, row_number() OVER (
                ORDER BY score_micro DESC, doc ASC) AS rank
            FROM per_doc
        ) WHERE rank <= 30
    ),
    ann AS (
        SELECT neighbor_id AS id, rank FROM (
            SELECT b.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY a.vec_id
                       ORDER BY {_SQL_COSINE} DESC, b.vec_id ASC
                   ) AS rank
            FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
            WHERE a.vec_id = 0
        ) WHERE rank <= 30
    ),
    contrib AS (
        SELECT id, CAST(round(1000000.0 / (60.0 + CAST(rank AS DOUBLE)))
                   AS BIGINT) AS c FROM bm
        UNION ALL
        SELECT id, CAST(round(1000000.0 / (60.0 + CAST(rank AS DOUBLE)))
                   AS BIGINT) AS c FROM ann
    ),
    fused AS (SELECT id, sum(c) AS rrf_micro FROM contrib GROUP BY id)
    SELECT id AS doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro, rank FROM (
        SELECT id, rrf_micro,
               row_number() OVER (ORDER BY rrf_micro DESC, id ASC) AS rank
        FROM fused
    ) WHERE rank <= 20
    """,
)
def q_hybrid_retrieval(spark, sf_dir):
    """Pipeline: HYBRID retrieval — reciprocal-rank fusion
    (pipeline/retrieval.py:rrf_fuse, Cormack et al. SIGIR'09) of the BM25
    lexical top-30 and the exact cosine ANN top-30 for query vector 0
    (documents and embeddings share the id space in these fixtures).
    Score-free fusion: BM25 micro-units and cosine are incomparable, but
    ranks always fuse; contributions frozen to integers so the fused
    total is an exact BIGINT sum both engines replay."""
    from .pipeline.retrieval import rrf_fuse

    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    emb = _t(spark, sf_dir, "embeddings")
    lexical = tx.bm25_topk(docs, "text", "doc_id", list(_BM25_TERMS), k=30)
    vector = sim.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=30
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return rrf_fuse([lexical.select("doc_id", "rank"), vector], k=20)


# ---------------------------------------------------------------------------
# Linear-interpolation resample — operators/resample.py
# ---------------------------------------------------------------------------
@register(
    "resample_interpolate",
    oracle=f"""
    WITH series AS ({_SQL_LWW}),
    obs AS (SELECT time AS t, value AS v FROM series WHERE value IS NOT NULL),
    grid AS (SELECT unnest(generate_series(TIMESTAMP '{_RESAMPLE_FROM}',
                    TIMESTAMP '{_RESAMPLE_TO}', INTERVAL 6 HOUR)) AS time),
    prev AS (SELECT g.time, o.t AS pt, o.v AS pv
             FROM grid g ASOF LEFT JOIN obs o ON g.time >= o.t),
    nxt AS (SELECT g.time, o.t AS nt, o.v AS nv
            FROM grid g ASOF LEFT JOIN obs o ON g.time < o.t)
    SELECT p.time,
           CASE WHEN p.pt IS NULL THEN NULL
                WHEN n.nt IS NULL THEN p.pv
                ELSE p.pv + (n.nv - p.pv) *
                     (CAST(epoch_us(p.time) - epoch_us(p.pt) AS DOUBLE)
                      / CAST(epoch_us(n.nt) - epoch_us(p.pt) AS DOUBLE))
           END AS value
    FROM prev p JOIN nxt n USING (time)
    """,
)
def q_resample_interpolate(spark, sf_dir):
    """Extension beyond reference ffill-only resample: time-weighted linear
    interpolation at grid points (pandas interpolate(method='time')
    equivalent), bin-compressed ffill/bfill anchors — the DuckDB oracle
    computes the same reals via native ASOF joins in both directions."""
    from qafs_spark.operators.resample import resample_interpolate

    series = last_write_wins(
        _event_series_df(spark, sf_dir),
        value_cols=["value"],
        tiebreak_cols=["event_id"],
    )
    return resample_interpolate(
        series.select("time", "value"),
        pd.Timestamp(_RESAMPLE_FROM),
        pd.Timestamp(_RESAMPLE_TO),
        "6h",
    )


# ---------------------------------------------------------------------------
# Rolling z-score anomaly detection — exact integer arithmetic
# ---------------------------------------------------------------------------
@register(
    "rolling_anomalies",
    oracle=f"""
    WITH scored AS (
        SELECT event_id, user_id, {_SQL_CENTS.format(x='value')} AS x,
               count(*) OVER w AS n,
               CAST(sum({_SQL_CENTS.format(x='value')}) OVER w AS BIGINT) AS s,
               CAST(sum({_SQL_CENTS.format(x='value')}
                        * {_SQL_CENTS.format(x='value')}) OVER w AS BIGINT) AS q
        FROM events
        WINDOW w AS (
            PARTITION BY user_id ORDER BY date_trunc('second', ts)
            RANGE BETWEEN INTERVAL 24 HOUR PRECEDING
                      AND INTERVAL 1 SECOND PRECEDING
        )
    )
    SELECT event_id, user_id, x AS value_cents, n AS base_n, s AS base_cents
    FROM scored
    WHERE n >= 5 AND (n * x - s) * (n * x - s) > 9 * (n * q - s * s)
    """,
)
def q_rolling_anomalies(spark, sf_dir):
    """Analytics: per-user trailing-24h z-score anomalies (|x - mean| >
    3*std against the PRECEDING window, self excluded) in EXACT integer
    arithmetic — the float z-score inequality cross-multiplies to
    (n*x - s)^2 > 9*(n*q - s^2) over BIGINT cents, so the flagged set is
    bit-reproducible on any engine (no float variance accumulation order).
    One hash shuffle by user, a bounded range frame, no self-join. BIGINT
    headroom: n*q needs n * max_cents^2 < 2^63 — fine to ~1e10-row windows
    at 4-digit values; switch the products to DECIMAL(38,0) beyond that
    (ANSI mode raises rather than wraps, so overflow is loud)."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    x = cents(F.col("value"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-86400, -1)
    )
    scored = ev.select(
        "event_id",
        "user_id",
        x.alias("x"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("s"),
        F.sum(x * x).over(w).alias("q"),
    )
    n, sx, q = F.col("n"), F.col("s"), F.col("q")
    dev = n * F.col("x") - sx
    return (
        scored.filter((n >= 5) & (dev * dev > F.lit(9) * (n * q - sx * sx)))
        .select(
            "event_id",
            "user_id",
            F.col("x").alias("value_cents"),
            n.alias("base_n"),
            sx.alias("base_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Data profiling: fixed-width histogram + seasonal traffic profile
# ---------------------------------------------------------------------------
@register(
    "value_histogram",
    oracle="""
    SELECT event_type, CAST(floor(value / 25.0) AS BIGINT) AS bin,
           count(*) AS n,
           CAST(min(round(value * 100)) AS BIGINT) AS lo_cents,
           CAST(max(round(value * 100)) AS BIGINT) AS hi_cents
    FROM events
    GROUP BY 1, 2
    """,
)
def q_value_histogram(spark, sf_dir):
    """Profiling: fixed-width (25-unit) value histogram per event type with
    exact bin extrema in cents — one map-side-combined aggregate; the bin
    expression floor(value/25.0) is a single correctly-rounded double op so
    bin assignment is engine-exact."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.floor(F.col("value") / F.lit(25.0)).cast("long").alias("bin"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min(cents(F.col("value"))).alias("lo_cents"),
        F.max(cents(F.col("value"))).alias("hi_cents"),
    )


@register(
    "resample_downsample",
    oracle=f"""
    WITH grid AS (
        SELECT unnest(generate_series(TIMESTAMP '{_RESAMPLE_FROM}',
                      TIMESTAMP '{_RESAMPLE_TO}', INTERVAL 1 DAY)) AS time
    ),
    clicks AS (
        SELECT TIMESTAMP '{_RESAMPLE_FROM}' + CAST(floor(
                 epoch(ts - TIMESTAMP '{_RESAMPLE_FROM}') / 86400) AS BIGINT)
                 * INTERVAL 1 DAY AS time,
               {_SQL_CENTS.format(x='value')} AS c
        FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '{_RESAMPLE_FROM}'
          AND ts < TIMESTAMP '{_RESAMPLE_TO}' + INTERVAL 1 DAY
    ),
    buys AS (
        SELECT TIMESTAMP '{_RESAMPLE_FROM}' + CAST(floor(
                 epoch(ts - TIMESTAMP '{_RESAMPLE_FROM}') / 86400) AS BIGINT)
                 * INTERVAL 1 DAY AS time,
               {_SQL_CENTS.format(x='value')} AS c
        FROM events
        WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '{_RESAMPLE_FROM}'
          AND ts < TIMESTAMP '{_RESAMPLE_TO}' + INTERVAL 1 DAY
    ),
    ca AS (SELECT time, CAST(sum(c) AS BIGINT) AS click_sum_cents,
                  CAST(max(c) AS BIGINT) AS click_max_cents
           FROM clicks GROUP BY 1),
    ba AS (SELECT time, count(c) AS buy_n FROM buys GROUP BY 1)
    SELECT g.time,
           ca.click_sum_cents,
           ca.click_max_cents,
           COALESCE(ba.buy_n, 0) AS buy_n
    FROM grid g LEFT JOIN ca USING (time) LEFT JOIN ba USING (time)
    """,
)
def q_resample_downsample(spark, sf_dir):
    """Downsample family (extension beyond the reference's as-of-only
    resample): per-bin aggregates onto the [from, to] daily grid —
    pandas ``resample('1d').agg({...})`` semantics (left-closed left-labeled
    bins, empty bins null / count 0). ONE tall-union groupBy(bin) for all
    series with map-side combine; integer cents keep sums/max/count
    hash-exact across engines. The time-range filter stays on the scan
    (no carry-in history needed, unlike the as-of family)."""
    from qafs_spark.operators.resample import resample_agg_multi

    ev = _t(spark, sf_dir, "events")

    def typed(etype, cname):
        return ev.filter(F.col("event_type") == etype).select(
            F.col("ts").alias("time"), cents(F.col("value")).alias(cname)
        )

    named = [
        ("click_sum_cents", typed("click", "click_sum_cents")),
        ("click_max_cents", typed("click", "click_max_cents")),
        ("buy_n", typed("purchase", "buy_n")),
    ]
    return resample_agg_multi(
        named,
        pd.Timestamp(_RESAMPLE_FROM),
        pd.Timestamp(_RESAMPLE_TO),
        "1d",
        how={"click_sum_cents": "sum", "click_max_cents": "max", "buy_n": "count"},
    )


@register(
    "seasonal_profile",
    oracle=f"""
    SELECT event_type,
           CAST(isodow(ts) AS BIGINT) AS dow,
           CAST(hour(ts) AS BIGINT) AS hod,
           count(*) AS n,
           CAST(sum({_SQL_CENTS.format(x='value')}) AS BIGINT) AS sum_cents
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def q_seasonal_profile(spark, sf_dir):
    """Profiling: hour-of-week traffic/value profile per event type (the
    observability seasonal baseline) — single aggregate, exact integer
    sums; Spark weekday()+1 == DuckDB isodow (Mon=1..Sun=7)."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        (F.weekday(F.col("ts")) + F.lit(1)).cast("long").alias("dow"),
        F.hour(F.col("ts")).cast("long").alias("hod"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents(F.col("value"))).alias("sum_cents"),
    )


# ---------------------------------------------------------------------------
# Per-COLUMN as-of resample (semantic sibling of the row-based golden)
# ---------------------------------------------------------------------------
_SQL_TYPED_SERIES = """
    SELECT date_trunc('hour', ts) AS time,
           ts + (event_id % 7) * INTERVAL 1 MINUTE AS created_time,
           value, event_id
    FROM events WHERE event_type = '{etype}'
"""


@register(
    "resample_percolumn",
    oracle=f"""
    WITH clicks AS (
        SELECT time, value FROM (
            SELECT time, value,
                   row_number() OVER (PARTITION BY time
                       ORDER BY created_time DESC, event_id DESC) AS rn
            FROM ({_SQL_TYPED_SERIES.format(etype='click')})
        ) WHERE rn = 1
    ),
    buys AS (
        SELECT time, value FROM (
            SELECT time, value,
                   row_number() OVER (PARTITION BY time
                       ORDER BY created_time DESC, event_id DESC) AS rn
            FROM ({_SQL_TYPED_SERIES.format(etype='purchase')})
        ) WHERE rn = 1
    ),
    grid AS (SELECT unnest(generate_series(TIMESTAMP '{_RESAMPLE_FROM}',
                    TIMESTAMP '{_RESAMPLE_TO}', INTERVAL 6 HOUR)) AS time)
    SELECT g.time, c.value AS click_value, b.value AS buy_value
    FROM grid g
    ASOF LEFT JOIN clicks c ON g.time >= c.time
    ASOF LEFT JOIN buys b ON g.time >= b.time
    """,
)
def q_resample_percolumn(spark, sf_dir):
    """Per-COLUMN as-of carry: each series independently takes its own last
    value at-or-before each grid point — vs the golden ROW-based semantics
    (resample_asof) where the latest aligned row wins all columns, nulls
    included. One bin-compressed resample per series, grids joined on time;
    the DuckDB oracle is two independent native ASOF joins."""
    from qafs_spark.operators.resample import resample_asof

    ev = _t(spark, sf_dir, "events")

    def typed_series(etype, cname):
        s = ev.filter(F.col("event_type") == etype).select(
            F.date_trunc("hour", F.col("ts")).alias("time"),
            (
                F.col("ts")
                + F.make_interval(mins=(F.col("event_id") % 7).cast("int"))
            ).alias("created_time"),
            F.col("value"),
            F.col("event_id"),
        )
        return last_write_wins(
            s, value_cols=["value"], tiebreak_cols=["event_id"]
        ).select("time", F.col("value").alias(cname))

    grid_a = resample_asof(
        typed_series("click", "click_value"), ["click_value"],
        pd.Timestamp(_RESAMPLE_FROM), pd.Timestamp(_RESAMPLE_TO), "6h",
    )
    grid_b = resample_asof(
        typed_series("purchase", "buy_value"), ["buy_value"],
        pd.Timestamp(_RESAMPLE_FROM), pd.Timestamp(_RESAMPLE_TO), "6h",
    )
    return grid_a.join(grid_b, on="time", how="inner")


# ---------------------------------------------------------------------------
# Sketches II: approximate top-k heavy hitters + mergeable HLL rollup
# ---------------------------------------------------------------------------
@register(
    "approx_top_terms",
    # certification pattern (= approx_distinct_users): exact values
    # hash-match; the sketch result is asserted within bounds as a boolean.
    oracle=r"""
    SELECT term, n, rank, true AS approx_ok FROM (
        SELECT term, count(*) AS n,
               row_number() OVER (ORDER BY count(*) DESC, term ASC) AS rank
        FROM (SELECT unnest(string_split_regex(trim(text), '\s+')) AS term
              FROM documents WHERE length(trim(text)) > 0)
        GROUP BY term
    ) WHERE rank <= 10
    """,
)
def q_approx_top_terms(spark, sf_dir):
    """Sketches: corpus-wide heavy hitters. Exact top-10 terms (bounded
    TakeOrderedAndProject + rank over <=10 rows, same shape as bm25) are
    hash-matched; Spark 4's approx_top_k sketch — the fixed-state path a
    100 TB corpus would use — is certified to report each of them within
    5% in the same scan."""
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    tok = docs.select(F.explode(tx.tokens(F.col("text"))).alias("term"))
    counts = tok.groupBy("term").agg(F.count(F.lit(1)).alias("n"))
    top = counts.orderBy(F.col("n").desc(), F.col("term").asc()).limit(10)
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    top = top.withColumn("rank", F.row_number().over(w))
    sketch = tok.agg(
        F.expr("approx_top_k(term, 20, 10000)").alias("hitters")
    )
    joined = top.crossJoin(F.broadcast(sketch))
    hit = F.filter(F.col("hitters"), lambda h: h["item"] == F.col("term"))
    approx_n = F.try_element_at(hit, F.lit(1))["count"]
    ok = approx_n.isNotNull() & (
        F.abs(approx_n - F.col("n")) <= F.col("n") * F.lit(0.05)
    )
    return joined.select("term", "n", "rank", ok.alias("approx_ok"))


@register(
    "hll_union_rollup",
    oracle="""
    SELECT CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS exact_distinct,
           true AS union_within_5pct
    FROM documents
    """,
)
def q_hll_union_rollup(spark, sf_dir):
    """Sketches: MERGEABILITY — per-source Datasketches HLL sketches union
    into the corpus-wide distinct count without rescanning (the pattern
    that lets 100 TB pipelines pre-aggregate sketches per partition/day and
    roll up arbitrarily later). Certified against the exact distinct in the
    same query."""
    docs = _t(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.expr("hll_sketch_agg(doc_id)").alias("sk")
    )
    merged = per_source.agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
    )
    exact = docs.agg(F.countDistinct("doc_id").alias("exact_distinct"))
    out = merged.crossJoin(F.broadcast(exact))
    ok = (
        F.abs(F.col("est") - F.col("exact_distinct"))
        <= F.col("exact_distinct") * F.lit(0.05)
    )
    return out.select(
        F.col("n_sources").cast("long").alias("n_sources"),
        F.col("exact_distinct").cast("long").alias("exact_distinct"),
        ok.alias("union_within_5pct"),
    )


@register(
    "theta_intersection_users",
    oracle="""
    SELECT CAST((SELECT count(DISTINCT user_id) FROM events
                 WHERE event_type = 'click') AS BIGINT) AS clickers,
           CAST((SELECT count(DISTINCT user_id) FROM events
                 WHERE event_type = 'purchase') AS BIGINT) AS buyers,
           CAST((SELECT count(DISTINCT e1.user_id) FROM events e1
                 WHERE e1.event_type = 'click'
                   AND EXISTS (SELECT 1 FROM events e2
                               WHERE e2.user_id = e1.user_id
                                 AND e2.event_type = 'purchase'))
                AS BIGINT) AS both_exact,
           true AS intersection_within_5pct
    """,
)
def q_theta_intersection_users(spark, sf_dir):
    """Sketches: SET OPERATIONS on sketches — theta sketches support
    intersection (HLL cannot), so 'users who clicked AND purchased' comes
    from two mergeable per-segment sketches with NO join or distinct
    shuffle of the raw stream. Certified against the exact semi-join count
    in the same query."""
    ev = _t(spark, sf_dir, "events")
    sk = ev.agg(
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'click' THEN user_id END)"
        ).alias("sk_click"),
        F.expr(
            "theta_sketch_agg(CASE WHEN event_type = 'purchase' THEN user_id END)"
        ).alias("sk_buy"),
    ).select(
        F.expr("theta_sketch_estimate(sk_click)").alias("est_click"),
        F.expr("theta_sketch_estimate(sk_buy)").alias("est_buy"),
        F.expr(
            "theta_sketch_estimate(theta_intersection(sk_click, sk_buy))"
        ).alias("est_both"),
    )
    clickers = ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    exact = (
        clickers.join(buyers, "user_id", "left_semi")
        .agg(F.count(F.lit(1)).alias("both_exact"))
        .crossJoin(clickers.agg(F.count(F.lit(1)).alias("clickers")))
        .crossJoin(buyers.agg(F.count(F.lit(1)).alias("buyers")))
    )
    out = exact.crossJoin(F.broadcast(sk))
    ok = (
        (F.abs(F.col("est_both") - F.col("both_exact"))
         <= F.col("both_exact") * F.lit(0.05))
        & (F.abs(F.col("est_click") - F.col("clickers"))
           <= F.col("clickers") * F.lit(0.05))
        & (F.abs(F.col("est_buy") - F.col("buyers"))
           <= F.col("buyers") * F.lit(0.05))
    )
    return out.select(
        F.col("clickers").cast("long").alias("clickers"),
        F.col("buyers").cast("long").alias("buyers"),
        F.col("both_exact").cast("long").alias("both_exact"),
        ok.alias("intersection_within_5pct"),
    )


# ---------------------------------------------------------------------------
# Bigram LM scoring (conditional-probability quality filter)
# ---------------------------------------------------------------------------
@register(
    "bigram_logprob",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc, string_split_regex(trim(text), '\s+') AS t
        FROM documents WHERE length(trim(text)) > 0
    ),
    big AS (
        SELECT doc, t[i] AS w1, t[i + 1] AS w2
        FROM tok, unnest(range(1, len(t))) AS u(i)
    ),
    c2 AS (SELECT w1, w2, count(*) AS n12 FROM big GROUP BY 1, 2),
    c1 AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM c2 GROUP BY 1),
    lp AS (SELECT w1, w2,
                  CAST(round(ln(CAST(n12 AS DOUBLE) / CAST(n1 AS DOUBLE))
                             * 1000000) AS BIGINT) AS lp
           FROM c2 JOIN c1 USING (w1))
    SELECT doc AS doc_id, count(*) AS n_bigrams,
           CAST(-sum(lp.lp) AS BIGINT) AS nll_micro
    FROM big JOIN lp USING (w1, w2)
    GROUP BY doc
    """,
)
def q_bigram_logprob(spark, sf_dir):
    """Pipeline: bigram conditional-LM NLL per doc — the CCNet-style
    perplexity filter shape, with the corpus itself as the LM:
    p(w2|w1) = c(w1,w2)/c(w1). Per-bigram log-probs freeze to micro-nats
    once per DISTINCT bigram (the context count c(w1) derives from the
    bigram counts, so no second corpus pass), then per-doc sums are exact
    BIGINT. Positional bigrams come straight off the token array
    (element_at i, i+1 over a sequence — no self-join)."""
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    tk = tx.tokens(F.col("text"))
    big = docs.select(
        F.col("doc_id").alias("doc"),
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 1),
                lambda i: F.struct(
                    F.element_at(tk, i).alias("w1"),
                    F.element_at(tk, i + 1).alias("w2"),
                ),
            )
        ).alias("b"),
    ).select("doc", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    c2 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n12"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    c1 = c2.groupBy("w1").agg(F.sum("n12").cast("long").alias("n1"))
    lp = c2.join(c1, "w1").select(
        "w1", "w2",
        F.round(
            F.log(F.col("n12").cast("double") / F.col("n1").cast("double"))
            * F.lit(1_000_000)
        ).cast("long").alias("lp"),
    )
    return (
        big.join(lp, ["w1", "w2"])
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            (-F.sum("lp")).cast("long").alias("nll_micro"),
        )
        .select(F.col("doc").alias("doc_id"), "n_bigrams", "nll_micro")
    )


# ---------------------------------------------------------------------------
# Token entropy + Gopher-style rule filter
# ---------------------------------------------------------------------------
@register(
    "doc_entropy",
    oracle=r"""
    WITH tok AS (
        SELECT doc_id AS doc,
               unnest(string_split_regex(trim(text), '\s+')) AS term
        FROM documents WHERE length(trim(text)) > 0
    ),
    tf AS (SELECT doc, term, count(*) AS c FROM tok GROUP BY 1, 2),
    dl AS (SELECT doc, CAST(sum(c) AS BIGINT) AS n FROM tf GROUP BY 1)
    SELECT tf.doc AS doc_id, max(dl.n) AS n_tokens,
           CAST(-sum(CAST(round((CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     * 1000000000) AS BIGINT)) AS BIGINT) AS entropy_nano
    FROM tf JOIN dl USING (doc)
    GROUP BY tf.doc
    """,
)
def q_doc_entropy(spark, sf_dir):
    """Pipeline: per-doc token Shannon entropy (low entropy = repetitive/
    boilerplate, the complement of doc_repetition's dup ratios). Each
    (doc, term) contribution -(p ln p) freezes to integer nano-nats before
    the per-doc sum, so no float accumulation order leaks in."""
    from pyspark import StorageLevel

    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    tok = docs.select(
        F.col("doc_id").alias("doc"), F.explode(tx.tokens(F.col("text"))).alias("term")
    )
    tf = (
        tok.groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    dl = tf.groupBy("doc").agg(F.sum("c").cast("long").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    contrib = F.round(p * F.log(p) * F.lit(1_000_000_000)).cast("long")
    return (
        tf.join(dl, "doc")
        .groupBy("doc")
        .agg(
            F.max("n").alias("n_tokens"),
            (-F.sum(contrib)).cast("long").alias("entropy_nano"),
        )
        .select(F.col("doc").alias("doc_id"), "n_tokens", "entropy_nano")
    )


@register(
    "gopher_rules",
    oracle=r"""
    WITH base AS (
        SELECT doc_id,
               len(string_split_regex(trim(text), '\s+')) AS n_tok,
               length(text) AS n_chars,
               length(replace(text, ' ', '')) AS n_nonspace
        FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id,
           (n_tok >= 50 AND n_tok <= 100000) AS ok_length,
           (n_chars >= 200) AS ok_chars,
           ((10 * n_nonspace >= 3 * n_chars)
            AND (n_tok = 0 OR n_nonspace <= 12 * n_tok)) AS ok_words,
           ((n_tok >= 50 AND n_tok <= 100000) AND (n_chars >= 200)
            AND (10 * n_nonspace >= 3 * n_chars)
            AND (n_tok = 0 OR n_nonspace <= 12 * n_tok)) AS passes
    FROM base
    """,
)
def q_gopher_rules(spark, sf_dir):
    """Pipeline: Gopher-style hard rule filter (token-count bounds, char
    floor, non-space density, mean-word-length cap) — every predicate is
    integer cross-multiplied (10*nonspace >= 3*chars instead of a float
    ratio), so the pass/fail set is engine-exact. Pure narrow map work."""
    docs = _t(spark, sf_dir, "documents").filter(F.length(F.trim("text")) > 0)
    n_tok = F.size(tx.tokens(F.col("text"))).cast("long")
    n_chars = F.length("text").cast("long")
    n_nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("long")
    base = docs.select(
        "doc_id",
        n_tok.alias("n_tok"),
        n_chars.alias("n_chars"),
        n_nonspace.alias("n_nonspace"),
    )
    ok_length = (F.col("n_tok") >= 50) & (F.col("n_tok") <= 100_000)
    ok_chars = F.col("n_chars") >= 200
    ok_words = (F.lit(10) * F.col("n_nonspace") >= F.lit(3) * F.col("n_chars")) & (
        (F.col("n_tok") == 0)
        | (F.col("n_nonspace") <= F.lit(12) * F.col("n_tok"))
    )
    return base.select(
        "doc_id",
        ok_length.alias("ok_length"),
        ok_chars.alias("ok_chars"),
        ok_words.alias("ok_words"),
        (ok_length & ok_chars & ok_words).alias("passes"),
    )


@register(
    "fingerprint_decontam",
    oracle="""
    WITH rolling AS (
        SELECT doc_id,
               list_transform(range(1, length(text) - 6),
                   i -> ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 8)), 1, 8))::BIGINT
               ) AS hashes
        FROM documents WHERE length(text) >= 8
    ),
    mins AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(hashes) - 2),
                   i -> list_min(list_slice(hashes, CAST(i AS INTEGER), CAST(i AS INTEGER) + 3))
               )) AS fp
        FROM rolling WHERE len(hashes) >= 4
    ),
    flat AS (SELECT doc_id, CAST(unnest(fp) AS BIGINT) AS h FROM mins),
    bf AS (SELECT DISTINCT h FROM flat WHERE doc_id % 97 = 0)
    SELECT doc_id, hits FROM (
        SELECT doc_id, count(*) AS hits
        FROM flat WHERE doc_id % 97 <> 0 AND h IN (SELECT h FROM bf)
        GROUP BY doc_id
    ) WHERE hits >= 3
    """,
)
def q_fingerprint_decontam(spark, sf_dir):
    """Pipeline: edit-robust decontamination via winnowing fingerprints —
    any shared substring of length >= k+w-1 = 11 chars leaves a shared
    fingerprint (MOSS guarantee), so light edits can't hide a leaked eval
    doc the way they evade exact n-gram matching. Benchmark fingerprint set
    broadcasts; corpus never shuffled whole."""
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return dc.fingerprint_hits(corpus, bench, "text", "doc_id", min_shared=3)


@register(
    "resample_nearest",
    oracle=f"""
    WITH series AS ({_SQL_LWW}),
    obs AS (SELECT time AS t, value AS v FROM series WHERE value IS NOT NULL),
    grid AS (SELECT unnest(generate_series(TIMESTAMP '{_RESAMPLE_FROM}',
                    TIMESTAMP '{_RESAMPLE_TO}', INTERVAL 6 HOUR)) AS time),
    prev AS (SELECT g.time, o.t AS pt, o.v AS pv
             FROM grid g ASOF LEFT JOIN obs o ON g.time >= o.t),
    nxt AS (SELECT g.time, o.t AS nt, o.v AS nv
            FROM grid g ASOF LEFT JOIN obs o ON g.time < o.t)
    SELECT p.time,
           CASE WHEN p.pt IS NULL AND n.nt IS NULL THEN NULL
                WHEN n.nt IS NULL THEN p.pv
                WHEN p.pt IS NULL THEN n.nv
                WHEN epoch_us(p.time) - epoch_us(p.pt)
                     <= epoch_us(n.nt) - epoch_us(p.time) THEN p.pv
                ELSE n.nv
           END AS value
    FROM prev p JOIN nxt n USING (time)
    """,
)
def q_resample_nearest(spark, sf_dir):
    """Extension: nearest-observation resample (pandas reindex
    method='nearest' convention, ties -> earlier) — completes the resample
    family alongside the as-of carry and linear interpolation; integer
    microsecond-distance comparison, no floats at all."""
    from qafs_spark.operators.resample import resample_nearest

    series = last_write_wins(
        _event_series_df(spark, sf_dir),
        value_cols=["value"],
        tiebreak_cols=["event_id"],
    )
    return resample_nearest(
        series.select("time", "value"),
        pd.Timestamp(_RESAMPLE_FROM),
        pd.Timestamp(_RESAMPLE_TO),
        "6h",
    )


# ---------------------------------------------------------------------------
# Cross-corpus line dedup + PII redaction (pipeline extensions, round 4)
# ---------------------------------------------------------------------------
_DEDUP_LINES_ORACLE = """
    WITH docs AS (
        SELECT doc_id,
               text || chr(10) || 'source: ' || source || chr(10) ||
               'boilerplate footer (c) example corpus' AS mt
        FROM documents
    ),
    lines AS (
        SELECT doc_id, arr[CAST(i AS INTEGER) + 1] AS line, CAST(i AS BIGINT) AS pos
        FROM (SELECT doc_id, string_split(mt, chr(10)) AS arr FROM docs),
             UNNEST(range(len(arr))) AS t(i)
    ),
    hot AS (
        SELECT trim(line) AS k
        FROM lines WHERE length(trim(line)) >= 1
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= 2
    ),
    kept AS (
        SELECT l.* FROM lines l LEFT JOIN hot h ON trim(l.line) = h.k
        WHERE h.k IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS clean,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.clean, '') AS text,
           CAST(len(string_split(d.mt, chr(10))) AS INTEGER) AS n_lines,
           CAST(len(string_split(d.mt, chr(10))) - COALESCE(r.n_kept, 0)
                AS INTEGER) AS n_removed
    FROM docs d LEFT JOIN rebuilt r USING (doc_id)
"""


@register("dedup_lines", oracle=_DEDUP_LINES_ORACLE)
def q_dedup_lines(spark, sf_dir):
    """Pipeline: C4/CCNet-style boilerplate removal — drop lines appearing
    (trimmed-identical) in >= 2 distinct documents, rejoin survivors in
    order. The fixture has single-line docs, so the query plants two known
    boilerplate lines (a per-source tag, ~25 docs each, and a global
    footer) identically in Spark and the oracle; genuinely duplicated
    fixture docs additionally lose their content line. Anti-join on the
    line key (NOT broadcast: the hot set is corpus-sized at scale);
    order-restoring reassembly is sort_array(collect_list) per doc — no
    global sort, no window."""
    from qafs_spark.pipeline.text import dedup_lines

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.concat(F.lit("source: "), F.col("source")),
            F.lit("boilerplate footer (c) example corpus"),
        ).alias("mt"),
    )
    return dedup_lines(docs, "mt", "doc_id", min_docs=2)


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_SSN = r"[0-9]{3}-[0-9]{2}-[0-9]{4}"
_PII_IPV4 = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"
_PII_PHONE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"
# scrub order matters: specific patterns (ssn, ipv4) before the greedy
# phone pattern so it cannot half-eat them; counts are on the original text
_PII_ORDER = [
    ("email", _PII_EMAIL), ("ssn", _PII_SSN),
    ("ipv4", _PII_IPV4), ("phone", _PII_PHONE),
]

_PII_TEXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'"
    " || ' phone (555) 010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' ip 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7'"
    " || CASE WHEN doc_id % 3 = 0 THEN ' ssn 123-45-' ||"
    " lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
)

_REDACT_PII_ORACLE = (
    "SELECT doc_id,\n"
    + "".join(
        "       CAST(len(regexp_extract_all(pt, '" + pat + "')) AS BIGINT)"
        " AS n_" + kind + ",\n"
        for kind, pat in _PII_ORDER
    )
    + "       "
    + "regexp_replace(" * len(_PII_ORDER)
    + "pt"
    + "".join(
        ", '" + pat + "', '<PII:" + kind + ">', 'g')"
        for kind, pat in _PII_ORDER
    )
    + " AS text\n"
    "FROM (SELECT doc_id, " + _PII_TEXT_SQL + " AS pt FROM documents)"
)


@register("redact_pii", oracle=_REDACT_PII_ORACLE)
def q_redact_pii(spark, sf_dir):
    """Pipeline: PII scrub pass — typed placeholder replacement + per-kind
    hit counts, pure chained regexp_replace/regexp_count (map-only,
    whole-stage codegen, RE2-safe patterns so Java and RE2 dialects agree
    character-for-character). The fixture has no PII, so the query plants
    deterministic emails/phones/ips/ssns from doc_id identically in Spark
    and the oracle."""
    from qafs_spark.pipeline.text import redact_pii

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@example.com"),
            F.lit(" phone (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" ip 10.0."), (F.col("doc_id") % 200).cast("string"),
            F.lit(".7"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" ssn 123-45-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
        ).alias("pt"),
    )
    out = redact_pii(docs, "pt", "doc_id", patterns=dict(_PII_ORDER))
    return out.select(
        "doc_id", *[f"n_{k}" for k, _ in _PII_ORDER], "text"
    )


_DEDUP_SPANS_ORACLE = """
    WITH docs AS (
        SELECT doc_id,
               'alpha ' || source || '. beta ' || source || '. gamma ' ||
               source || '. ' || text || ' tail ' || CAST(doc_id AS VARCHAR)
               || '.' AS mt
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               list_transform(regexp_extract_all(mt, '[^.!?]+[.!?]'),
                              x -> trim(x)) AS arr
        FROM docs
    ),
    sents AS (
        SELECT doc_id, arr[CAST(i AS INTEGER) + 1] AS sent,
               CAST(i AS BIGINT) AS pos
        FROM s, UNNEST(range(len(arr))) t(i)
    ),
    spans AS (
        SELECT doc_id, CAST(i AS BIGINT) AS spos,
               array_to_string(arr[CAST(i AS INTEGER) + 1 :
                                   CAST(i AS INTEGER) + 3], ' ') AS stext
        FROM s, UNNEST(range(len(arr) - 2)) t(i)
        WHERE len(arr) >= 3
    ),
    hot AS (
        SELECT stext FROM spans GROUP BY 1
        HAVING count(DISTINCT doc_id) >= 2
    ),
    removed AS (
        SELECT DISTINCT sp.doc_id, sp.spos + CAST(j AS BIGINT) AS pos
        FROM spans sp JOIN hot USING (stext), UNNEST(range(3)) u(j)
    ),
    kept AS (
        SELECT se.* FROM sents se
        LEFT JOIN removed r ON se.doc_id = r.doc_id AND se.pos = r.pos
        WHERE r.doc_id IS NULL
    ),
    rebuilt AS (
        SELECT doc_id, string_agg(sent, ' ' ORDER BY pos) AS clean,
               count(*) AS n_kept
        FROM kept GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(r.clean, '') AS text,
           CAST(len(s.arr) AS INTEGER) AS n_sentences,
           CAST(len(s.arr) - COALESCE(r.n_kept, 0) AS INTEGER)
               AS n_removed_sentences
    FROM docs d JOIN s USING (doc_id) LEFT JOIN rebuilt r USING (doc_id)
"""


@register("dedup_spans", oracle=_DEDUP_SPANS_ORACLE)
def q_dedup_spans(spark, sf_dir):
    """Pipeline: C4-style three-sentence-span dedup (drop-everywhere
    variant) — spans duplicated across >= 2 distinct docs mark their
    sentences for removal; survivors rejoin in order. The fixture docs
    carry no sentence structure, so the query builds one deterministically:
    three per-source boilerplate sentences (~25 docs share each source →
    their leading span is hot and gets stripped) followed by the doc's own
    text as a unique tail sentence. Span construction is doc-local array
    work; corpus-wide cost is one groupBy(span) + one anti equi-join."""
    from qafs_spark.pipeline.text import dedup_spans

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("alpha "), F.col("source"),
            F.lit(". beta "), F.col("source"),
            F.lit(". gamma "), F.col("source"),
            F.lit(". "), F.col("text"),
            F.lit(" tail "), F.col("doc_id").cast("string"), F.lit("."),
        ).alias("mt"),
    )
    out = dedup_spans(docs, "mt", "doc_id", span=3, min_docs=2)
    return out.select(
        "doc_id", "text",
        F.col("n_sentences").cast("int").alias("n_sentences"),
        F.col("n_removed_sentences").cast("int").alias("n_removed_sentences"),
    )


@register(
    "rollup_roundtrip",
    oracle=f"""
    WITH series AS ({_SQL_LWW}),
    cents AS (
        SELECT time, CAST({_SQL_CENTS.format(x='value')} AS DOUBLE) AS c
        FROM series
        WHERE time >= TIMESTAMP '2024-01-10 00:00:00'
          AND time < TIMESTAMP '2024-01-24 00:00:00' + INTERVAL 1 DAY
    ),
    binned AS (
        SELECT TIMESTAMP '2024-01-10 00:00:00' + CAST(floor(
                 epoch(time - TIMESTAMP '2024-01-10 00:00:00') / 86400)
                 AS BIGINT) * INTERVAL 1 DAY AS time,
               sum(c) / count(c) AS value
        FROM cents GROUP BY 1
    ),
    grid AS (
        SELECT unnest(generate_series(TIMESTAMP '2024-01-10 00:00:00',
                      TIMESTAMP '2024-01-24 00:00:00', INTERVAL 1 DAY)) AS time
    )
    SELECT g.time, b.value FROM grid g LEFT JOIN binned b USING (time)
    """,
)
def q_rollup_roundtrip(spark, sf_dir):
    """Store API end-to-end #2: ingest the LWW events series (values in
    CENTS so bin sums stay integer-valued doubles — exact in any summation
    order), fs.materialize a daily-MEAN rollup into a second namespace,
    then read the MATERIALIZED feature back. Certifies materialize +
    downsample + re-registration against SQL computed straight off the raw
    events. Mean = exact-integer sum / count, so the doubles replay
    bit-for-bit cross-engine."""
    import shutil
    import tempfile

    from .checks import Column
    from .core import FeatureStore

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    root = tempfile.mkdtemp(prefix="qafs_rollup_rt_")
    try:
        fs = FeatureStore(storage=root, spark=spark)
        fs.create_namespace("bench")
        fs.create_feature("bench/event_cents", check=Column(float))
        src = _event_series_df(spark, sf_dir).select(
            "time", "created_time",
            cents(F.col("value")).cast("double").alias("bench/event_cents"),
        )
        fs.save_df(src, "bench/event_cents")
        targets = fs.materialize(
            "bench/event_cents", "rollups",
            from_date="2024-01-10", to_date="2024-01-24",
            freq="1d", method="mean", suffix="_daily_mean",
        )
        out = fs.load_features(targets[0]).select(
            F.col("time"), F.col(targets[0]).alias("value")
        )
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(root, ignore_errors=True)
