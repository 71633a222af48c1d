"""Window-family aggregations beyond the tumbling candle: sliding windows,
session windows, and rollup subtotals (SURVEY.md T2 names the primitive
family — ``window(c, "5 minutes", "1 minute")``, ``session_window`` — as
the same operator class the reference's gold job uses).

Scale notes: sliding windows multiply each row by window/slide before ONE
hash-partitioned shuffle (same shape as the tumbling candle, x5 map-side
rows, partial agg still applies). Session windows shuffle once on the
session key; Spark merges per-key sorted runs, so state is bounded by
open sessions, not events. Rollup is a single shuffle with grouping-set
expansion map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import SUM_DECIMAL, dsum, fmt_ts, sql_dsum, sql_fmt_ts
from ..operators.gold import candles
from ..operators.ranges import interval_point_join
from ..operators.ticks import EVENTS_TICKS_CTE, events_as_ticks
from ..sources.testdata import load_table
from .registry import register

#: sliding-candle geometry: 5-minute windows advancing by 1 minute.
SLIDE_WINDOW_MIN, SLIDE_STEP_MIN = 5, 1

#: session gap: a user's events chain into one session while consecutive
#: gaps stay under this bound (events median inter-arrival is ~7 h, so a
#: 4 h gap yields many multi-event sessions AND many splits).
SESSION_GAP_HOURS = 4


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_ticks(load_table(spark, sf_dir, "events"))


@register(
    "candles_sliding_5m",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
win AS (
  SELECT symbol, price, size,
         date_trunc('minute', trade_timestamp)
           - k.k * INTERVAL {SLIDE_STEP_MIN} MINUTE AS window_start
  FROM ticks,
       (SELECT unnest(range(0, {SLIDE_WINDOW_MIN // SLIDE_STEP_MIN})) AS k) k
)
SELECT
  {sql_fmt_ts("window_start")} AS window_start,
  {sql_fmt_ts(f"window_start + INTERVAL {SLIDE_WINDOW_MIN} MINUTE")} AS window_end,
  symbol,
  max(price) AS high,
  min(price) AS low,
  count(*) AS trade_count,
  {sql_dsum("price * size")} / {sql_dsum("size")} AS vwap
FROM win
GROUP BY 1, 2, 3
""",
    doc="Sliding-window candles: 5-minute windows advancing by 1 minute "
    "(overlapping T2 variant) — each tick lands in 5 buckets; high/low/"
    "count/vwap per bucket. Oracle expands the bucket membership with an "
    "explicit start-offset range, which is exactly Spark's window(w, s) "
    "expansion.",
    tags=("gold", "window", "sliding"),
)
def candles_sliding_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = candles(
        _ticks(spark, sf_dir),
        window=f"{SLIDE_WINDOW_MIN} minutes",
        slide=f"{SLIDE_STEP_MIN} minute",
    )
    return gold.select(
        fmt_ts("window_start", "window_start"),
        fmt_ts("window_end", "window_end"),
        "symbol",
        "high",
        "low",
        "trade_count",
        "vwap",
    )


@register(
    "user_session_stats",
    oracle=f"""
WITH m AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL {SESSION_GAP_HOURS} HOUR
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                          ROWS UNBOUNDED PRECEDING) AS sid
  FROM m
)
SELECT user_id,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts) + INTERVAL {SESSION_GAP_HOURS} HOUR) AS session_end_us,
       count(*) AS n_events
FROM s GROUP BY user_id, sid
""",
    doc="Session-window aggregation (T2 family, session_window primitive): "
    "per-user event sessions with a 4-hour inactivity gap; emits session "
    "bounds (end = last event + gap, Spark's session_window contract) and "
    "event counts. Oracle is the gaps-and-islands rewrite: lag + cumulative "
    "session id — identical semantics because Spark starts a new session "
    "exactly when the gap to the previous event reaches the timeout "
    "(windows are [start, end) half-open).",
    tags=("session", "window", "streaming-family"),
)
def user_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    sess = events.groupBy(
        F.session_window(F.col("ts"), f"{SESSION_GAP_HOURS} hours").alias("w"),
        "user_id",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return sess.select(
        "user_id",
        F.unix_micros(F.col("w.start")).alias("session_start_us"),
        F.unix_micros(F.col("w.end")).alias("session_end_us"),
        "n_events",
    )


#: busy-window range join: hours with at least this many events become
#: [hour - 30 min, hour + 90 min) intervals (deliberately overlapping).
BUSY_HOUR_MIN_EVENTS = 20


@register(
    "busy_window_events",
    oracle=f"""
WITH h AS (
  SELECT date_trunc('hour', ts) AS h
  FROM events GROUP BY 1 HAVING count(*) >= {BUSY_HOUR_MIN_EVENTS}
),
i AS (
  SELECT epoch_us(h) AS interval_id,
         h - INTERVAL 30 MINUTE AS s,
         h + INTERVAL 90 MINUTE AS e
  FROM h
)
SELECT i.interval_id, count(*) AS n_events,
       count(DISTINCT ev.user_id) AS n_users
FROM events ev JOIN i ON ev.ts >= i.s AND ev.ts < i.e
GROUP BY 1
""",
    doc="Range (interval-containment) join: busy hours expand to "
    "overlapping 2-hour intervals, and every event is joined into every "
    "interval containing its timestamp via the chunk-bucketed rewrite "
    "(operators/ranges.py) — one equi-shuffle on the chunk id, exact "
    "range filter partition-local, NO nested-loop. Oracle is the plain "
    "SQL inequality join (DuckDB plans it as IEJoin).",
    tags=("join", "range", "interval"),
)
def busy_window_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    hours = (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= BUSY_HOUR_MIN_EVENTS)
    )
    intervals = hours.select(
        F.unix_micros(F.col("h")).alias("interval_id"),
        (F.col("h") - F.expr("INTERVAL 30 MINUTES")).alias("start"),
        (F.col("h") + F.expr("INTERVAL 90 MINUTES")).alias("end"),
    )
    pairs = interval_point_join(
        events.select("ts", "user_id"),
        intervals,
        ts_col="ts",
        chunk_seconds=1800,
    )
    return pairs.groupBy("interval_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "venue_symbol_rollup",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT venue, symbol, count(*) AS n_trades,
       {sql_dsum("price * size")} / {sql_dsum("size")} AS vwap
FROM ticks
GROUP BY ROLLUP (venue, symbol)
""",
    doc="Hierarchical rollup subtotals (hypertable-rollup pattern): one "
    "pass produces (venue, symbol) cells, per-venue subtotals, and the "
    "grand total; NULL marks the rolled-up level in both engines. Single "
    "shuffle with map-side grouping-set expansion.",
    tags=("aggregate", "rollup"),
)
def venue_symbol_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    price, size = F.col("price"), F.col("size")
    return (
        t.rollup("venue", "symbol")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum((price * size).cast(SUM_DECIMAL)).alias("_pv"),
            F.sum(size.cast(SUM_DECIMAL)).alias("_v"),
        )
        .select(
            "venue",
            "symbol",
            "n_trades",
            (F.col("_pv").cast("double") / F.col("_v").cast("double")).alias("vwap"),
        )
    )


@register(
    "venue_side_cube",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT venue, taker_side, count(*) AS n_trades,
       {sql_dsum("price * size")} AS notional
FROM ticks
GROUP BY CUBE (venue, taker_side)
""",
    doc="Full cube over (venue, taker_side): all four grouping sets — "
    "cells, both one-dimension margins, and the grand total — in one "
    "pass (rollup's superset; SURVEY.md A-family extension). Same "
    "single-shuffle grouping-set expansion as the rollup, 2^d sets.",
    tags=("aggregate", "cube"),
)
def venue_side_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    price, size = F.col("price"), F.col("size")
    return (
        t.cube("venue", "taker_side")
        .agg(
            F.count(F.lit(1)).alias("n_trades"),
            F.sum((price * size).cast(SUM_DECIMAL)).alias("_pv"),
        )
        .select(
            "venue",
            "taker_side",
            "n_trades",
            F.col("_pv").cast("double").alias("notional"),
        )
    )


@register(
    "venue_grouping_sets",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT venue, taker_side,
       CAST(grouping(venue) * 2 + grouping(taker_side) AS BIGINT) AS gid,
       count(*) AS n_ticks,
       {sql_dsum("price")} AS total_price
FROM ticks
GROUP BY GROUPING SETS ((venue, taker_side), (venue), ())
""",
    doc="Explicit GROUPING SETS — the irregular-subtotal shape rollup and "
    "cube cannot express (here: (venue, side), (venue), and grand total, "
    "but NOT (side) alone). Spark's DataFrame.groupingSets plans the "
    "same Expand-then-aggregate as cube/rollup: each input row fans out "
    "to its matching sets map-side, one hash shuffle aggregates all "
    "three granularities, and grouping() bits disambiguate NULL-as-"
    "subtotal from NULL data. grouping_id arithmetic is identical in "
    "both engines.",
    tags=("windows", "grouping-sets", "aggregate"),
)
def venue_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    return (
        t.groupingSets(
            [["venue", "taker_side"], ["venue"], []],
            F.col("venue"),
            F.col("taker_side"),
        )
        .agg(
            (F.grouping("venue") * 2 + F.grouping("taker_side"))
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_ticks"),
            dsum("price").alias("total_price"),
        )
        .select("venue", "taker_side", "gid", "n_ticks", "total_price")
    )


@register(
    "revenue_time_rollup",
    oracle=f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(quarter(o_orderdate) AS BIGINT) AS o_quarter,
       CAST(month(o_orderdate) AS BIGINT) AS o_month,
       CAST(grouping(year(o_orderdate)) * 4
            + grouping(quarter(o_orderdate)) * 2
            + grouping(month(o_orderdate)) AS BIGINT) AS gid,
       count(*) AS n_orders,
       {sql_dsum("o_totalprice")} AS revenue
FROM orders
GROUP BY ROLLUP (year(o_orderdate), quarter(o_orderdate), month(o_orderdate))
""",
    doc="Time-hierarchy rollup: revenue at month, quarter, year, and "
    "grand-total granularity in ONE aggregation pass — the OLAP "
    "drill-down table a dashboard reads instead of re-querying per "
    "level. Calendar fields are computed once in the projection, the "
    "Expand emits 4 granularity rows per input map-side, and a single "
    "hash shuffle finishes all levels; grouping() bits mark subtotal "
    "rows. Revenue sums ride the exact-decimal discipline.",
    tags=("windows", "rollup", "aggregate", "date"),
)
def revenue_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").cast("long").alias("o_year"),
        F.quarter("o_orderdate").cast("long").alias("o_quarter"),
        F.month("o_orderdate").cast("long").alias("o_month"),
        "o_totalprice",
    )
    return (
        o.rollup("o_year", "o_quarter", "o_month")
        .agg(
            (
                F.grouping("o_year") * 4
                + F.grouping("o_quarter") * 2
                + F.grouping("o_month")
            )
            .cast("long")
            .alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .select("o_year", "o_quarter", "o_month", "gid", "n_orders", "revenue")
    )
