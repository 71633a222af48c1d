"""Bid/ask microstructure queries over the NBBO-carrying tick mapping.

The reference's wire record carries ``best_bid`` / ``best_ask`` /
``best_bid_size`` / ``best_ask_size`` and then DROPS them at the silver
parse (``src/jobs/process_silver.py:33-43`` reads the payload, projects
only price/volume/time — SURVEY.md section 1.2 calls the dropped quote
fields "the fields a true arbitrage spread would need"). This module is
the engine's answer: the quote-level operator family every real
arbitrage/execution user computes first —

- quoted spread (and relative spread in bp) per symbol-minute,
- effective spread vs quoted, with at/inside/through-quote print counts,
- microprice (depth-weighted quote midpoint) and its one-minute-ahead
  drift-prediction diagnostic,
- depth imbalance per symbol-hour,
- cross-venue NBBO and crossed-market detection (the quote-level
  arbitrage signal the reference's trade-only spread approximates).

Quote synthesis is the deterministic fixture mapping
(`operators.ticks.events_as_quotes` / ``EVENTS_QUOTES_CTE``) — one op
chain written identically in both engines so every double hashes
bit-for-bit.

Scale shapes (100 TB): everything here is ONE shuffle into
(symbol, window) groups from a narrow codegen'd projection — the same
shape as the gold candle build; the drift diagnostic's per-symbol
sequential pass runs on `chunked_lag` (symbol x day chunks, never a
|symbols|-parallelism window over raw minutes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import davg, fmt_ts, sql_davg
from ..operators.chunked_lag import chunked_lag
from ..operators.ticks import EVENTS_QUOTES_CTE, events_as_quotes
from ..sources.testdata import load_table
from .registry import register

#: deterministic per-(symbol, window) "last row" key, shared by every
#: max_by below; DuckDB twin is the HUGEINT arg_max key in the oracles.
#: A function, not a module constant: Column construction needs an
#: active SparkContext, which does not exist at import time.
def _last_key():
    return F.struct(F.col("trade_timestamp"), F.col("trade_id"))
_SQL_LAST_KEY = "epoch_us(trade_timestamp)::HUGEINT * 1000000000000 + trade_id"


def _quotes(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_quotes(load_table(spark, sf_dir, "events"))


@register(
    "tick_quoted_spread_1m",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE}
SELECT symbol,
       strftime(date_trunc('minute', trade_timestamp),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_quotes,
       {sql_davg('ask - bid')} AS avg_quoted_spread,
       {sql_davg('(ask - bid) / mid * 10000.0')} AS avg_rel_spread_bp,
       max(ask - bid) AS max_quoted_spread
FROM quotes WHERE mid > 0 GROUP BY 1, 2
""",
    doc="Quoted spread per (symbol, minute) — the first microstructure "
    "dial on any desk: average ask-bid (exact order-independent mean), "
    "average RELATIVE spread in basis points of the midpoint, and the "
    "minute's widest quote. mid > 0 gates the relative division "
    "identically in both engines (the synthetic tape can print an "
    "exact-0.0 price). One narrow codegen'd projection, one shuffle "
    "into (symbol, minute) groups — the gold-candle shape.",
    tags=("silver", "finance", "microstructure", "aggregate"),
)
def tick_quoted_spread_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quotes(spark, sf_dir).filter(F.col("mid") > 0)
    spread = F.col("ask") - F.col("bid")
    return q.groupBy(
        "symbol",
        fmt_ts(F.date_trunc("minute", F.col("trade_timestamp")), "window_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_quotes"),
        davg(spread).alias("avg_quoted_spread"),
        davg(spread / F.col("mid") * F.lit(10000.0)).alias("avg_rel_spread_bp"),
        F.max(spread).alias("max_quoted_spread"),
    )


@register(
    "tick_effective_spread_by_side",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE}
SELECT symbol, taker_side,
       count(*) AS n_trades,
       CAST(sum(CASE WHEN price > bid AND price < ask THEN 1 ELSE 0 END)
            AS BIGINT) AS n_inside_quotes,
       CAST(sum(CASE WHEN price < bid OR price > ask THEN 1 ELSE 0 END)
            AS BIGINT) AS n_through_quotes,
       {sql_davg('2.0 * abs(price - mid) / mid * 10000.0')}
         AS avg_effective_spread_bp,
       {sql_davg('(ask - bid) / mid * 10000.0')} AS avg_quoted_spread_bp
FROM quotes WHERE mid > 0 GROUP BY 1, 2
""",
    doc="Effective vs quoted spread per (symbol, taker side): "
    "2*|price - mid| in bp (what the print actually paid) against the "
    "quoted spread in bp (what the book offered), plus counts of "
    "inside-quote prints (price improvement) and through-quote prints "
    "(sweeps). The effective/quoted ratio is THE execution-quality "
    "headline; it is non-trivial here because the fixture's quote "
    "midpoint is deliberately decoupled from the trade price "
    "(operators/ticks.py::events_as_quotes). Map-side combinable "
    "single aggregation.",
    tags=("silver", "finance", "microstructure", "aggregate"),
)
def tick_effective_spread_by_side(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quotes(spark, sf_dir).filter(F.col("mid") > 0)
    inside = (F.col("price") > F.col("bid")) & (F.col("price") < F.col("ask"))
    through = (F.col("price") < F.col("bid")) | (F.col("price") > F.col("ask"))
    eff_bp = (
        F.lit(2.0) * F.abs(F.col("price") - F.col("mid")) / F.col("mid")
        * F.lit(10000.0)
    )
    quoted_bp = (F.col("ask") - F.col("bid")) / F.col("mid") * F.lit(10000.0)
    return q.groupBy("symbol", "taker_side").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(F.when(inside, 1).otherwise(0)).alias("n_inside_quotes"),
        F.sum(F.when(through, 1).otherwise(0)).alias("n_through_quotes"),
        davg(eff_bp).alias("avg_effective_spread_bp"),
        davg(quoted_bp).alias("avg_quoted_spread_bp"),
    )


@register(
    "tick_microprice_drift",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
q AS (
  SELECT *,
         (bid * CAST(ask_size AS DOUBLE) + ask * CAST(bid_size AS DOUBLE))
           / CAST(bid_size + ask_size AS DOUBLE) AS micro
  FROM quotes WHERE mid > 0
),
m AS (
  SELECT symbol, date_trunc('minute', trade_timestamp) AS w,
         arg_max(mid, {_SQL_LAST_KEY}) AS last_mid,
         arg_max(micro - mid, {_SQL_LAST_KEY}) AS last_prem
  FROM q GROUP BY 1, 2
),
r AS (
  SELECT symbol, last_mid, last_prem,
         lag(last_mid) OVER (PARTITION BY symbol ORDER BY w) AS prev_mid,
         lag(last_prem) OVER (PARTITION BY symbol ORDER BY w) AS prev_prem
  FROM m
),
s AS (
  SELECT symbol, last_mid - prev_mid AS ret, prev_prem, prev_mid
  FROM r WHERE prev_mid IS NOT NULL AND prev_mid > 0
)
SELECT symbol,
       count(*) AS n_minutes,
       CAST(sum(CASE WHEN prev_prem > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_signal_up,
       CAST(sum(CASE WHEN (prev_prem > 0 AND ret > 0)
                       OR (prev_prem < 0 AND ret < 0)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
       {sql_davg('prev_prem / prev_mid * 10000.0')} AS avg_prev_premium_bp
FROM s GROUP BY symbol
""",
    doc="Microprice drift diagnostic — does the depth-weighted quote "
    "midpoint (microprice = (bid*ask_size + ask*bid_size)/(bid_size+"
    "ask_size), the canonical short-horizon fair-value estimator) "
    "predict the NEXT minute's midpoint move? Per (symbol, minute) the "
    "deterministic last mid and last microprice premium; the premium is "
    "lagged one minute (chunk-decomposed over symbol x day — a bare "
    "3-symbol window would serialize years of minutes per task) and "
    "scored against the realized mid change by sign agreement. Counts "
    "are exact integers; the average prior premium uses the exact "
    "order-independent mean.",
    tags=("silver", "finance", "microstructure", "window-function"),
)
def tick_microprice_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quotes(spark, sf_dir).filter(F.col("mid") > 0)
    micro = (
        F.col("bid") * F.col("ask_size").cast("double")
        + F.col("ask") * F.col("bid_size").cast("double")
    ) / (F.col("bid_size") + F.col("ask_size")).cast("double")
    m = q.withColumn("micro", micro).groupBy(
        "symbol", F.date_trunc("minute", F.col("trade_timestamp")).alias("w")
    ).agg(
        F.max_by("mid", _last_key()).alias("last_mid"),
        F.max_by(F.col("micro") - F.col("mid"), _last_key()).alias("last_prem"),
    )
    # one lag of a (mid, prem) struct: a single chunk-decomposed pass
    # instead of two
    packed = m.withColumn("mm", F.struct(F.col("last_mid"), F.col("last_prem")))
    r = chunked_lag(
        packed,
        key_cols=["symbol"],
        order_col="w",
        value_col="mm",
        chunk=F.date_trunc("day", F.col("w")),
        out_col="prev_mm",
    )
    s = r.filter(
        F.col("prev_mm").isNotNull() & (F.col("prev_mm.last_mid") > 0)
    ).select(
        "symbol",
        (F.col("last_mid") - F.col("prev_mm.last_mid")).alias("ret"),
        F.col("prev_mm.last_prem").alias("prev_prem"),
        F.col("prev_mm.last_mid").alias("prev_mid"),
    )
    agree = ((F.col("prev_prem") > 0) & (F.col("ret") > 0)) | (
        (F.col("prev_prem") < 0) & (F.col("ret") < 0)
    )
    return s.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum(F.when(F.col("prev_prem") > 0, 1).otherwise(0)).alias(
            "n_signal_up"
        ),
        F.sum(F.when(agree, 1).otherwise(0)).alias("n_agree"),
        davg(F.col("prev_prem") / F.col("prev_mid") * F.lit(10000.0)).alias(
            "avg_prev_premium_bp"
        ),
    )


@register(
    "tick_quote_imbalance_1h",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE}
SELECT symbol,
       strftime(date_trunc('hour', trade_timestamp),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n_quotes,
       CAST(sum(bid_size) AS BIGINT) AS total_bid_size,
       CAST(sum(ask_size) AS BIGINT) AS total_ask_size,
       {sql_davg('CAST(bid_size - ask_size AS DOUBLE) '
                 '/ CAST(bid_size + ask_size AS DOUBLE)')} AS avg_imbalance
FROM quotes GROUP BY 1, 2
""",
    doc="Top-of-book depth imbalance per (symbol, hour): exact BIGINT "
    "depth totals plus the exact mean of the per-quote imbalance ratio "
    "(bid_size - ask_size)/(bid_size + ask_size) — the standard "
    "order-flow-pressure dial (depth is never 0: fixture sizes are "
    ">= 1). Pure map-side-combinable aggregation, one shuffle.",
    tags=("silver", "finance", "microstructure", "aggregate"),
)
def tick_quote_imbalance_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quotes(spark, sf_dir)
    imb = (F.col("bid_size") - F.col("ask_size")).cast("double") / (
        F.col("bid_size") + F.col("ask_size")
    ).cast("double")
    return q.groupBy(
        "symbol",
        fmt_ts(F.date_trunc("hour", F.col("trade_timestamp")), "window_start"),
    ).agg(
        F.count(F.lit(1)).alias("n_quotes"),
        F.sum("bid_size").alias("total_bid_size"),
        F.sum("ask_size").alias("total_ask_size"),
        davg(imb).alias("avg_imbalance"),
    )


@register(
    "tick_nbbo_crossed_markets",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
v AS (
  SELECT symbol, venue, date_trunc('minute', trade_timestamp) AS w,
         arg_max(bid, {_SQL_LAST_KEY}) AS last_bid,
         arg_max(ask, {_SQL_LAST_KEY}) AS last_ask
  FROM quotes WHERE mid > 0 GROUP BY 1, 2, 3
),
n AS (
  SELECT symbol, w,
         max(last_bid) AS nbb, min(last_ask) AS nbo,
         count(*) AS n_venues
  FROM v GROUP BY 1, 2
),
b AS (SELECT * FROM n WHERE n_venues = 2)
SELECT symbol,
       count(*) AS n_minutes_quoted_both,
       CAST(sum(CASE WHEN nbb > nbo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_crossed,
       coalesce(max(CASE WHEN nbb > nbo
                         THEN (nbb - nbo) / nbo * 10000.0 END), 0.0)
         AS max_cross_bp
FROM b GROUP BY symbol
""",
    doc="Cross-venue NBBO and crossed-market detection — the QUOTE-level "
    "arbitrage signal the reference's trade-only spread "
    "(src/jobs/gold_layer.py) approximates: per (symbol, minute, venue) "
    "the deterministic last bid/ask, reduced to the national best bid "
    "(max over venues) and best offer (min over venues); a minute where "
    "both venues quote and NBB > NBO is a crossed market — buy the ask "
    "on one venue, hit the bid on the other. Reports crossed-minute "
    "counts and the widest cross in bp. Two small shuffles (minute-"
    "venue, then minute), both map-side combinable; venue cardinality "
    "is tiny so the second stage is minutes-sized, never tick-sized.",
    tags=("silver", "finance", "microstructure", "arbitrage", "aggregate"),
)
def tick_nbbo_crossed_markets(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _quotes(spark, sf_dir).filter(F.col("mid") > 0)
    v = q.groupBy(
        "symbol",
        "venue",
        F.date_trunc("minute", F.col("trade_timestamp")).alias("w"),
    ).agg(
        F.max_by("bid", _last_key()).alias("last_bid"),
        F.max_by("ask", _last_key()).alias("last_ask"),
    )
    n = v.groupBy("symbol", "w").agg(
        F.max("last_bid").alias("nbb"),
        F.min("last_ask").alias("nbo"),
        F.count(F.lit(1)).alias("n_venues"),
    )
    b = n.filter(F.col("n_venues") == 2)
    crossed = F.col("nbb") > F.col("nbo")
    cross_bp = (F.col("nbb") - F.col("nbo")) / F.col("nbo") * F.lit(10000.0)
    return b.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_minutes_quoted_both"),
        F.sum(F.when(crossed, 1).otherwise(0)).alias("n_crossed"),
        F.coalesce(
            F.max(F.when(crossed, cross_bp)), F.lit(0.0)
        ).alias("max_cross_bp"),
    )
