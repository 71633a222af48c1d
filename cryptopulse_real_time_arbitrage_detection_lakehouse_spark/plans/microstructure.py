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
  arbitrage signal the reference's trade-only spread approximates),
- Roll (1984) trade-implied spread, reported against the actual quoted
  spread,
- Kyle's lambda (price impact per unit signed flow — completes the
  VPIN/Amihud/Kyle liquidity triptych),
- Lee-Ready (1991) trade-side classification, audited against the
  fixture's true taker side,
- realized variance vs bipower variation (jump detection),
- order flow imbalance (Cont-Kukanov-Stoikov) with its mid-change
  regression.

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

from ..functions.determinism import davg, fmt_ts, gavg, sql_davg, sql_dsum, sql_gavg
from ..operators.chunked_lag import chunked_lag
from ..operators.ticks import EVENTS_QUOTES_CTE, EVENTS_TICKS_CTE, events_as_quotes
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
       {sql_gavg('(ask - bid) / mid * 10000.0')} AS avg_rel_spread_bp,
       max(ask - bid) AS max_quoted_spread
FROM quotes WHERE mid > 0 GROUP BY 1, 2
""",
    doc="Quoted spread per (symbol, minute) — the first microstructure "
    "dial on any desk: average ask-bid (exact order-independent mean), "
    "average RELATIVE spread in bp of the midpoint (the bp ratio is "
    "UNBOUNDED when mid is a micro-price, so it averages on the exact "
    "0.01-bp integer grid — the implementation-shortfall convention — "
    "instead of a magnitude-assuming decimal grid), and the "
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
        gavg(spread / F.col("mid") * F.lit(10000.0)).alias("avg_rel_spread_bp"),
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
       {sql_gavg('2.0 * abs(price - mid) / mid * 10000.0')}
         AS avg_effective_spread_bp,
       {sql_gavg('(ask - bid) / mid * 10000.0')} AS avg_quoted_spread_bp
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
        gavg(eff_bp).alias("avg_effective_spread_bp"),
        gavg(quoted_bp).alias("avg_quoted_spread_bp"),
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
       {sql_gavg('prev_prem / prev_mid * 10000.0')} AS avg_prev_premium_bp
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
    "are exact integers; the average prior premium in bp averages on "
    "the exact 0.01-bp integer grid (the ratio is unbounded when the "
    "prior mid is a micro-price).",
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
        gavg(F.col("prev_prem") / F.col("prev_mid") * F.lit(10000.0)).alias(
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


def _minute_closes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-(symbol, minute) last trade price and exact
    integer signed volume (floor(size), sign from the taker side) —
    the minute bars Roll/Kyle regress over. One tick shuffle."""
    q = _quotes(spark, sf_dir)
    signed = F.when(
        F.col("taker_side").isin("purchase", "signup"),
        F.floor(F.col("size")).cast("long"),
    ).otherwise(-F.floor(F.col("size")).cast("long"))
    return q.groupBy(
        "symbol", F.date_trunc("minute", F.col("trade_timestamp")).alias("w")
    ).agg(
        F.max_by("price", _last_key()).alias("close"),
        F.sum(signed).alias("signed_vol"),
    )


_SQL_MINUTE_CLOSES = f"""
m AS (
  SELECT symbol, date_trunc('minute', trade_timestamp) AS w,
         arg_max(price, {_SQL_LAST_KEY}) AS close,
         CAST(sum(CASE WHEN taker_side IN ('purchase', 'signup')
                       THEN CAST(floor(size) AS BIGINT)
                       ELSE -CAST(floor(size) AS BIGINT) END) AS BIGINT)
           AS signed_vol
  FROM quotes GROUP BY 1, 2
)
"""


@register(
    "tick_roll_spread_estimate",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
{_SQL_MINUTE_CLOSES},
d AS (
  SELECT symbol, w,
         close - lag(close) OVER (PARTITION BY symbol ORDER BY w) AS dp
  FROM m
),
p AS (
  SELECT symbol, dp,
         lag(dp) OVER (PARTITION BY symbol ORDER BY w) AS dp_prev
  FROM d WHERE dp IS NOT NULL
),
s AS (
  SELECT symbol, count(*) AS n_pairs,
         {sql_dsum('dp')} AS sx, {sql_dsum('dp_prev')} AS sy,
         {sql_dsum('dp * dp_prev')} AS sxy
  FROM p WHERE dp_prev IS NOT NULL GROUP BY symbol
),
c AS (
  SELECT symbol, n_pairs,
         (CAST(n_pairs AS DOUBLE) * sxy - sx * sy)
           / (CAST(n_pairs AS DOUBLE) * CAST(n_pairs AS DOUBLE))
           AS serial_cov
  FROM s
),
q2 AS (
  SELECT symbol, {sql_davg('ask - bid')} AS avg_quoted_spread
  FROM quotes WHERE mid > 0 GROUP BY symbol
)
SELECT c.symbol, c.n_pairs, c.serial_cov,
       CASE WHEN c.serial_cov < 0
            THEN 2.0 * sqrt(-c.serial_cov) END AS roll_spread,
       q2.avg_quoted_spread
FROM c JOIN q2 ON c.symbol = q2.symbol
""",
    doc="Roll (1984) implied spread — the classic estimator that reads "
    "the effective spread out of TRADE PRICES ALONE: bid-ask bounce "
    "makes consecutive price changes negatively serially correlated, "
    "and spread = 2*sqrt(-serial_cov(dp_t, dp_t-1)) when the "
    "covariance is negative (NULL when the bounce is swamped — the "
    "estimator's documented failure mode, surfaced rather than "
    "clamped). Reported NEXT TO the actual average quoted spread from "
    "the NBBO fixture, which is the whole point of having both: a "
    "desk sanity-checks its quote feed against the trade-implied "
    "number. Minute closes are deterministic selections; both lags are "
    "per-symbol over MINUTES (symbols x minutes rows, not ticks); "
    "moment sums use the exact decimal discipline and the covariance "
    "is one fixed IEEE chain in both engines.",
    tags=("silver", "finance", "microstructure", "window-function"),
)
def tick_roll_spread_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.determinism import dsum

    m = _minute_closes(spark, sf_dir)
    d = chunked_lag(
        m.select("symbol", "w", "close"),
        key_cols=["symbol"],
        order_col="w",
        value_col="close",
        chunk=F.date_trunc("day", F.col("w")),
        out_col="prev_close",
    ).select(
        "symbol", "w", (F.col("close") - F.col("prev_close")).alias("dp")
    ).filter(F.col("dp").isNotNull())
    p = chunked_lag(
        d,
        key_cols=["symbol"],
        order_col="w",
        value_col="dp",
        chunk=F.date_trunc("day", F.col("w")),
        out_col="dp_prev",
    ).filter(F.col("dp_prev").isNotNull())
    s = p.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dsum(F.col("dp")).alias("sx"),
        dsum(F.col("dp_prev")).alias("sy"),
        dsum(F.col("dp") * F.col("dp_prev")).alias("sxy"),
    )
    n_d = F.col("n_pairs").cast("double")
    cov = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (n_d * n_d)
    c = s.select("symbol", "n_pairs", cov.alias("serial_cov"))
    q2 = (
        _quotes(spark, sf_dir)
        .filter(F.col("mid") > 0)
        .groupBy("symbol")
        .agg(davg(F.col("ask") - F.col("bid")).alias("avg_quoted_spread"))
    )
    return c.join(q2, "symbol").select(
        "symbol",
        "n_pairs",
        "serial_cov",
        F.when(
            F.col("serial_cov") < 0,
            F.lit(2.0) * F.sqrt(-F.col("serial_cov")),
        ).alias("roll_spread"),
        "avg_quoted_spread",
    )


@register(
    "tick_kyle_lambda",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
{_SQL_MINUTE_CLOSES},
d AS (
  SELECT symbol, signed_vol AS x,
         close - lag(close) OVER (PARTITION BY symbol ORDER BY w) AS y
  FROM m
),
s AS (
  SELECT symbol, count(*) AS n_minutes,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         {sql_dsum('y')} AS sy,
         {sql_dsum('CAST(x AS DOUBLE) * y')} AS sxy
  FROM d WHERE y IS NOT NULL GROUP BY symbol
)
SELECT symbol, n_minutes, sx AS total_signed_vol,
       CASE WHEN CAST(n_minutes AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
            THEN NULL
            ELSE (CAST(n_minutes AS DOUBLE) * sxy
                  - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n_minutes AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1000000.0
       END AS kyle_lambda_1e6
FROM s
""",
    doc="Kyle's lambda — THE price-impact regression (price change per "
    "unit of signed order flow, the slope market makers quote around): "
    "per symbol, OLS of minute close changes on minute NET SIGNED "
    "VOLUME (exact integers: floor(size) signed by the taker side; "
    "|x| <= 3e9 is ENFORCED so each x^2 fits BIGINT — Spark would wrap "
    "silently where DuckDB errors — and the moment sums are exact "
    "while they stay inside BIGINT; the y "
    "moments use the decimal discipline). The slope is one fixed IEEE "
    "chain over five aggregates, scaled 1e6 into a well-conditioned "
    "range; a zero-variance flow series returns NULL rather than a "
    "fake zero. Completes the liquidity triptych: VPIN (flow "
    "toxicity), Amihud (impact per dollar), Kyle (impact per share). "
    "One tick shuffle into minutes, one chunk-decomposed lag, one "
    "per-symbol aggregate.",
    tags=("silver", "finance", "microstructure", "aggregate"),
)
def tick_kyle_lambda(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.determinism import dsum

    m = _minute_closes(spark, sf_dir)
    d = chunked_lag(
        m,
        key_cols=["symbol"],
        order_col="w",
        value_col="close",
        chunk=F.date_trunc("day", F.col("w")),
        out_col="prev_close",
    ).select(
        "symbol",
        # same bound/rationale as tick_order_flow_imbalance's x guard
        (
            F.col("signed_vol")
            + F.coalesce(
                F.assert_true(
                    F.abs(F.col("signed_vol")) <= F.lit(3_000_000_000),
                    F.lit(
                        "tick_kyle_lambda: |minute signed volume| > 3e9"
                        " overflows the exact BIGINT x*x moment"
                    ),
                ).cast("long"),
                F.lit(0),
            )
        ).alias("x"),
        (F.col("close") - F.col("prev_close")).alias("y"),
    ).filter(F.col("y").isNotNull())
    s = d.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
    )
    n_d = F.col("n_minutes").cast("double")
    sx_d = F.col("sx").cast("double")
    denom = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    lam = (
        (n_d * F.col("sxy") - sx_d * F.col("sy")) / denom * F.lit(1000000.0)
    )
    return s.select(
        "symbol",
        "n_minutes",
        F.col("sx").alias("total_signed_vol"),
        F.when(denom != 0.0, lam).alias("kyle_lambda_1e6"),
    )


@register(
    "tick_lee_ready_classification",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
t AS (
  SELECT symbol, epoch_us(trade_timestamp) AS ts_us, trade_id, price, mid,
         CASE WHEN taker_side IN ('purchase', 'signup') THEN 1
              ELSE -1 END AS truth
  FROM quotes
),
d AS (
  SELECT *,
         lag(price) OVER (PARTITION BY symbol ORDER BY ts_us, trade_id)
           AS prev_price
  FROM t
),
g AS (
  SELECT *,
         CASE WHEN prev_price IS NULL THEN NULL
              WHEN price > prev_price THEN 1
              WHEN price < prev_price THEN -1 END AS dpdir
  FROM d
),
l AS (
  SELECT *,
         last_value(dpdir IGNORE NULLS)
           OVER (PARTITION BY symbol ORDER BY ts_us, trade_id
                 ROWS UNBOUNDED PRECEDING) AS ldir
  FROM g
),
c AS (
  SELECT symbol, truth,
         CASE WHEN price > mid THEN 1
              WHEN price < mid THEN -1
              ELSE ldir END AS sign,
         CASE WHEN price > mid OR price < mid THEN 1 ELSE 0 END AS by_quote
  FROM l
)
SELECT symbol,
       count(*) AS n_trades,
       CAST(sum(by_quote) AS BIGINT) AS n_quote_rule,
       CAST(sum(CASE WHEN by_quote = 0 AND sign IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_tick_test,
       CAST(sum(CASE WHEN sign IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unclassified,
       CAST(sum(CASE WHEN sign = truth THEN 1 ELSE 0 END) AS BIGINT)
         AS n_correct,
       CAST(sum(CASE WHEN sign = truth THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(sum(CASE WHEN sign IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) AS accuracy
FROM c GROUP BY symbol
""",
    doc="Lee-Ready (1991) trade-side classification, audited against the "
    "fixture's true taker side: the quote rule first (price above the "
    "midpoint = buyer-initiated, below = seller-initiated), falling "
    "back to the TICK TEST at the midpoint (direction of the last "
    "non-zero price change — an exact LOCF over the nullified-zeros "
    "change sign). This is the algorithm behind every TAQ-derived "
    "order-flow dataset; having both quotes AND the generator's true "
    "side makes it an accuracy AUDIT, the thing real research pipelines "
    "can never have. Tick-level lag and LOCF are both chunk-decomposed "
    "(symbol x day via the zero-padded (ts, trade_id) key — same "
    "enforced-non-negative invariant as VPIN); counts are exact "
    "integers and accuracy one final long/long IEEE division.",
    tags=("silver", "finance", "microstructure", "window-function"),
)
def tick_lee_ready_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rolling import chunked_locf

    t = _quotes(spark, sf_dir).select(
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
        "price",
        "mid",
        F.when(F.col("taker_side").isin("purchase", "signup"), F.lit(1))
        .otherwise(F.lit(-1))
        .alias("truth"),
    ).withColumn(
        "__ord",
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lpad(F.col("trade_id").cast("string"), 20, "0"),
            F.coalesce(
                F.assert_true(
                    (F.col("ts_us") >= 0) & (F.col("trade_id") >= 0),
                    F.lit(
                        "tick_lee_ready_classification: negative ts_us/"
                        "trade_id breaks the lexicographic order key"
                    ),
                ).cast("string"),
                F.lit(""),
            ),
        ),
    )
    day = F.timestamp_micros(F.col("ts_us"))
    d = chunked_lag(
        t,
        key_cols=["symbol"],
        order_col="__ord",
        value_col="price",
        chunk=F.date_trunc("day", day),
        out_col="prev_price",
    )
    g = d.withColumn(
        "dpdir",
        F.when(F.col("prev_price").isNull(), F.lit(None).cast("int"))
        .when(F.col("price") > F.col("prev_price"), F.lit(1))
        .when(F.col("price") < F.col("prev_price"), F.lit(-1)),
    )
    l = chunked_locf(
        g,
        key_cols=["symbol"],
        order_col="__ord",
        value_col="dpdir",
        chunk=F.date_trunc("day", day),
        out_col="ldir",
    )
    by_quote = (F.col("price") > F.col("mid")) | (F.col("price") < F.col("mid"))
    sign = (
        F.when(F.col("price") > F.col("mid"), F.lit(1))
        .when(F.col("price") < F.col("mid"), F.lit(-1))
        .otherwise(F.col("ldir"))
    )
    c = l.select("symbol", "truth", sign.alias("sign"), by_quote.alias("bq"))
    n_correct = F.sum(F.when(F.col("sign") == F.col("truth"), 1).otherwise(0))
    n_classified = F.sum(F.when(F.col("sign").isNotNull(), 1).otherwise(0))
    return c.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(F.when(F.col("bq"), 1).otherwise(0)).alias("n_quote_rule"),
        F.sum(
            F.when(~F.col("bq") & F.col("sign").isNotNull(), 1).otherwise(0)
        ).alias("n_tick_test"),
        F.sum(F.when(F.col("sign").isNull(), 1).otherwise(0)).alias(
            "n_unclassified"
        ),
        n_correct.alias("n_correct"),
        (n_correct.cast("double") / n_classified.cast("double")).alias(
            "accuracy"
        ),
    )


#: pi/2 as the exact IEEE double literal, written identically in both
#: engines (never a pi() builtin, whose repr could differ in the SQL
#: text round-trip)
_HALF_PI = 1.5707963267948966


@register(
    "candle_realized_variance_jumps",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
{_SQL_MINUTE_CLOSES},
r AS (
  SELECT symbol, date_trunc('day', w) AS day, w,
         close / lag(close) OVER (PARTITION BY symbol, date_trunc('day', w)
                                  ORDER BY w) - 1.0 AS ret,
         lag(close) OVER (PARTITION BY symbol, date_trunc('day', w)
                          ORDER BY w) AS prev
  FROM m
),
rr AS (
  SELECT symbol, day, ret,
         lag(ret) OVER (PARTITION BY symbol, day ORDER BY w) AS ret_prev
  FROM r WHERE prev IS NOT NULL AND prev > 0 AND abs(ret) <= 10.0
),
q AS (
  SELECT symbol, day,
         CAST(floor(ret * 1000000.0) AS BIGINT) AS qr,
         CAST(floor(ret_prev * 1000000.0) AS BIGINT) AS qr_prev
  FROM rr
),
s AS (
  SELECT symbol, strftime(day, '%Y-%m-%d') AS day,
         count(*) AS n_returns,
         CAST(sum(qr * qr) AS BIGINT) AS rv_q,
         CAST(sum(abs(qr) * abs(qr_prev)) AS BIGINT) AS bp_q
  FROM q GROUP BY 1, 2
)
SELECT symbol, day, n_returns,
       CAST(rv_q AS DOUBLE) / 1000000000000.0 AS rv,
       {_HALF_PI!r} * (CAST(bp_q AS DOUBLE) / 1000000000000.0) AS bpv,
       CASE WHEN rv_q > 0
            THEN greatest(0.0, 1.0 - {_HALF_PI!r}
                 * (CAST(bp_q AS DOUBLE) / 1000000000000.0)
                 / (CAST(rv_q AS DOUBLE) / 1000000000000.0)) END AS jump_frac
FROM s
""",
    doc="Realized variance vs bipower variation — the jump detector "
    "(Barndorff-Nielsen & Shephard): per (symbol, day) over 1-minute "
    "returns, RV = sum(r^2) converges to total variance INCLUDING "
    "jumps while BPV = (pi/2) * sum(|r_t||r_t-1|) is jump-robust, so "
    "jump_frac = max(0, 1 - BPV/RV) reads the share of the day's "
    "variance contributed by discontinuous moves — the dial that "
    "separates a gappy tape from a volatile one. Returns over 1000% are "
    "dropped — the data-error winsorization every RV pipeline applies "
    "(the synthetic tape prints $0.05 -> $100 minute moves, and such a "
    "term's double ulp exceeds any shared decimal grid's step, which "
    "would break cross-engine exactness; the gate compares IDENTICAL "
    "doubles in both engines). Returns and the adjacent-product pair "
    "ride plain windows PARTITIONED BY (symbol, day) — partition count "
    "is symbols x days, so the 'sequential' pass is already "
    "chunk-grained and parallel. Float discipline: returns are "
    "quantized to an exact 1e-6 integer grid FIRST (floor of identical "
    "doubles — a shared DECIMAL grid cannot hold r^2 terms spanning 8 "
    "orders of magnitude without last-ulp rounding divergence, "
    "observed at sf0.01), the moment sums are then EXACT BIGINTs "
    "(<= 1440 minutes/day bounds them at ANY scale factor), and "
    "rv/bpv/jump_frac are a fixed IEEE chain off those integers with "
    "pi/2 as the same literal in both engines.",
    tags=("gold", "finance", "microstructure", "window-function"),
)
def candle_realized_variance_jumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    m = _minute_closes(spark, sf_dir).withColumn(
        "day", F.date_trunc("day", F.col("w"))
    )
    w_sd = W.partitionBy("symbol", "day").orderBy("w")
    r = m.select(
        "symbol",
        "day",
        "w",
        (F.col("close") / F.lag("close").over(w_sd) - F.lit(1.0)).alias("ret"),
        F.lag("close").over(w_sd).alias("prev"),
    ).filter(
        F.col("prev").isNotNull()
        & (F.col("prev") > 0)
        & (F.abs(F.col("ret")) <= 10.0)
    )
    rr = r.select(
        "symbol",
        "day",
        "ret",
        F.lag("ret").over(W.partitionBy("symbol", "day").orderBy("w")).alias(
            "ret_prev"
        ),
    )
    q = rr.select(
        "symbol",
        "day",
        F.floor(F.col("ret") * F.lit(1000000.0)).cast("long").alias("qr"),
        F.floor(F.col("ret_prev") * F.lit(1000000.0))
        .cast("long")
        .alias("qr_prev"),
    )
    s = q.groupBy(
        "symbol", F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_returns"),
        F.sum(F.col("qr") * F.col("qr")).alias("rv_q"),
        F.sum(F.abs(F.col("qr")) * F.abs(F.col("qr_prev"))).alias("bp_q"),
    )
    rv = F.col("rv_q").cast("double") / F.lit(1000000000000.0)
    bpv = F.lit(_HALF_PI) * (
        F.col("bp_q").cast("double") / F.lit(1000000000000.0)
    )
    return s.select(
        "symbol",
        "day",
        "n_returns",
        rv.alias("rv"),
        bpv.alias("bpv"),
        F.when(
            F.col("rv_q") > 0,
            F.greatest(F.lit(0.0), F.lit(1.0) - bpv / rv),
        ).alias("jump_frac"),
    )


@register(
    "tick_order_flow_imbalance",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
t AS (
  SELECT symbol, epoch_us(trade_timestamp) AS ts_us, trade_id,
         bid, ask, bid_size, ask_size, mid
  FROM quotes
),
d AS (
  SELECT *,
         lag(bid) OVER w AS pb, lag(ask) OVER w AS pa,
         lag(bid_size) OVER w AS pbs, lag(ask_size) OVER w AS pas
  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY ts_us, trade_id)
),
e AS (
  SELECT symbol, ts_us, trade_id, mid,
         (CASE WHEN bid >= pb THEN bid_size ELSE 0 END
          - CASE WHEN bid <= pb THEN pbs ELSE 0 END
          - CASE WHEN ask <= pa THEN ask_size ELSE 0 END
          + CASE WHEN ask >= pa THEN pas ELSE 0 END) AS ev
  FROM d WHERE pb IS NOT NULL
),
m AS (
  SELECT symbol, date_trunc('minute', to_timestamp(ts_us / 1000000.0)) AS w,
         CAST(sum(ev) AS BIGINT) AS ofi,
         arg_max(mid, ts_us::HUGEINT * 1000000000000 + trade_id) AS last_mid
  FROM e GROUP BY 1, 2
),
r AS (
  SELECT symbol, ofi AS x,
         last_mid - lag(last_mid) OVER (PARTITION BY symbol ORDER BY w)
           AS y
  FROM m
),
s AS (
  SELECT symbol, count(*) AS n_minutes,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * x) AS BIGINT) AS sxx,
         {sql_dsum('y')} AS sy, {sql_dsum('CAST(x AS DOUBLE) * y')} AS sxy
  FROM r WHERE y IS NOT NULL GROUP BY symbol
)
SELECT symbol, n_minutes, sx AS total_ofi,
       CASE WHEN CAST(n_minutes AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0.0
            THEN NULL
            ELSE (CAST(n_minutes AS DOUBLE) * sxy
                  - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n_minutes AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * 1000000.0
       END AS ofi_beta_1e6
FROM s
""",
    doc="Order flow imbalance (Cont-Kukanov-Stoikov) — the quote-UPDATE "
    "flow measure that (their central empirical result) explains "
    "short-horizon price moves better than trade volume: per quote "
    "event, e_n adds the bid size when the bid holds or improves, "
    "subtracts the prior bid size when it holds or worsens, and "
    "mirrors on the ask — EXACT INTEGERS throughout (sizes are "
    "integers; the bid/ask comparisons are on identical doubles), so "
    "per-minute OFI is a BIGINT sum (|OFI| <= 3e9 ENFORCED so each "
    "x^2 fits BIGINT; moment sums exact while inside BIGINT). The per-symbol OLS of minute mid "
    "changes on OFI (ofi_beta) is the same exact-moment chain as "
    "Kyle's lambda. The tick-level quote lag is chunk-decomposed over "
    "symbol x day via a packed struct (one pass for all four prior "
    "quote fields); minute reduction and regression are map-side "
    "aggregates.",
    tags=("silver", "finance", "microstructure", "window-function"),
)
def tick_order_flow_imbalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.determinism import dsum

    t = _quotes(spark, sf_dir).select(
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
        "bid",
        "ask",
        "bid_size",
        "ask_size",
        "mid",
    ).withColumn(
        "__ord",
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lpad(F.col("trade_id").cast("string"), 20, "0"),
            F.coalesce(
                F.assert_true(
                    (F.col("ts_us") >= 0) & (F.col("trade_id") >= 0),
                    F.lit(
                        "tick_order_flow_imbalance: negative ts_us/"
                        "trade_id breaks the lexicographic order key"
                    ),
                ).cast("string"),
                F.lit(""),
            ),
        ),
    ).withColumn(
        "q4",
        F.struct(
            F.col("bid"), F.col("ask"), F.col("bid_size"), F.col("ask_size")
        ),
    )
    d = chunked_lag(
        t,
        key_cols=["symbol"],
        order_col="__ord",
        value_col="q4",
        chunk=F.date_trunc("day", F.timestamp_micros(F.col("ts_us"))),
        out_col="pq",
    ).filter(F.col("pq").isNotNull())
    ev = (
        F.when(F.col("bid") >= F.col("pq.bid"), F.col("bid_size")).otherwise(0)
        - F.when(F.col("bid") <= F.col("pq.bid"), F.col("pq.bid_size")).otherwise(0)
        - F.when(F.col("ask") <= F.col("pq.ask"), F.col("ask_size")).otherwise(0)
        + F.when(F.col("ask") >= F.col("pq.ask"), F.col("pq.ask_size")).otherwise(0)
    )
    m = d.select(
        "symbol", "ts_us", "trade_id", "mid", ev.alias("ev")
    ).groupBy(
        "symbol",
        F.date_trunc(
            "minute", F.timestamp_micros(F.col("ts_us"))
        ).alias("w"),
    ).agg(
        F.sum("ev").alias("ofi"),
        # composite (ts_us, trade_id) tie-break — the repo-wide last-row
        # convention (_last_key); a bare ts_us key could diverge from
        # the oracle if two quotes share a microsecond
        F.max_by("mid", F.struct(F.col("ts_us"), F.col("trade_id"))).alias(
            "last_mid"
        ),
    )
    r = chunked_lag(
        m,
        key_cols=["symbol"],
        order_col="w",
        value_col="last_mid",
        chunk=F.date_trunc("day", F.col("w")),
        out_col="prev_mid",
    ).select(
        "symbol",
        # |x| <= 3e9 keeps every x*x inside BIGINT: Spark would wrap
        # SILENTLY where DuckDB's HUGEINT sum errors loudly, so the
        # bound is enforced (the VPIN order-key guard idiom), not assumed
        (
            F.col("ofi")
            + F.coalesce(
                F.assert_true(
                    F.abs(F.col("ofi")) <= F.lit(3_000_000_000),
                    F.lit(
                        "tick_order_flow_imbalance: |per-minute OFI| > 3e9"
                        " overflows the exact BIGINT x*x moment"
                    ),
                ).cast("long"),
                F.lit(0),
            )
        ).alias("x"),
        (F.col("last_mid") - F.col("prev_mid")).alias("y"),
    ).filter(F.col("y").isNotNull())
    s = r.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_minutes"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        dsum(F.col("y")).alias("sy"),
        dsum(F.col("x").cast("double") * F.col("y")).alias("sxy"),
    )
    n_d = F.col("n_minutes").cast("double")
    sx_d = F.col("sx").cast("double")
    denom = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    beta = (
        (n_d * F.col("sxy") - sx_d * F.col("sy")) / denom * F.lit(1000000.0)
    )
    return s.select(
        "symbol",
        "n_minutes",
        F.col("sx").alias("total_ofi"),
        F.when(denom != 0.0, beta).alias("ofi_beta_1e6"),
    )


@register(
    "tick_implementation_shortfall",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
q AS (SELECT * FROM quotes WHERE mid > 0),
arr AS (
  SELECT symbol, date_trunc('hour', trade_timestamp) AS h,
         arg_min(mid, {_SQL_LAST_KEY}) AS arrival_mid
  FROM q GROUP BY 1, 2
),
t AS (
  SELECT q.symbol, date_trunc('hour', q.trade_timestamp) AS h,
         q.price, q.size,
         CASE WHEN q.taker_side IN ('purchase', 'signup')
              THEN 1.0 ELSE -1.0 END AS side,
         a.arrival_mid
  FROM q JOIN arr a
    ON q.symbol = a.symbol AND date_trunc('hour', q.trade_timestamp) = a.h
  WHERE a.arrival_mid > 0
)
SELECT symbol, strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
       count(*) AS n_trades,
       CAST(sum(CASE WHEN side = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_buys,
       arg_min(arrival_mid, arrival_mid) AS arrival_mid,
       CAST(sum(CAST(floor(side * (price - arrival_mid) / arrival_mid
                            * 10000.0 * 100.0) AS BIGINT)) AS DOUBLE)
         / (100.0 * CAST(count(*) AS DOUBLE)) AS avg_shortfall_bp,
       ({sql_dsum('price * size')} / {sql_dsum('size')} - min(arrival_mid))
         / min(arrival_mid) * 10000.0 AS vwap_drift_bp
FROM t GROUP BY 1, 2
""",
    doc="Implementation shortfall per (symbol, hour) — the execution "
    "benchmark every algo desk reports: each fill's side-signed "
    "slippage vs the ARRIVAL midpoint (the hour's first quote mid, a "
    "deterministic min_by selection), averaged on an exact 0.01-bp "
    "integer grid (slippage is UNBOUNDED when arrival is a micro-price "
    "print, so a shared decimal grid would diverge in the last ulp — "
    "floor-quantized BIGINT sums are exact in both engines), plus the "
    "hour's exact-decimal VWAP drift off arrival. Positive shortfall = paying up; buys and sells sign "
    "symmetrically so passive fills net out. The arrival frame is "
    "symbols x hours rows — a BROADCAST join back onto the fills, "
    "never a tick-side shuffle beyond the hour aggregation.",
    tags=("silver", "finance", "microstructure", "aggregate", "join"),
)
def tick_implementation_shortfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import broadcast

    from ..functions.determinism import dsum

    q = _quotes(spark, sf_dir).filter(F.col("mid") > 0)
    h = F.date_trunc("hour", F.col("trade_timestamp"))
    arr = q.groupBy("symbol", h.alias("h")).agg(
        F.min_by("mid", _last_key()).alias("arrival_mid")
    )
    t = q.select(
        "symbol",
        h.alias("h"),
        "price",
        "size",
        F.when(
            F.col("taker_side").isin("purchase", "signup"), F.lit(1.0)
        )
        .otherwise(F.lit(-1.0))
        .alias("side"),
    ).join(broadcast(arr.filter(F.col("arrival_mid") > 0)), ["symbol", "h"])
    slip = (
        F.col("side")
        * (F.col("price") - F.col("arrival_mid"))
        / F.col("arrival_mid")
        * F.lit(10000.0)
    )
    return t.groupBy(
        "symbol", fmt_ts(F.col("h"), "hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n_trades"),
        F.sum(F.when(F.col("side") == 1.0, 1).otherwise(0)).alias("n_buys"),
        F.min_by("arrival_mid", F.col("arrival_mid")).alias("arrival_mid"),
        (
            F.sum(F.floor(slip * F.lit(100.0)).cast("long")).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)).cast("double"))
        ).alias("avg_shortfall_bp"),
        (
            (
                dsum(F.col("price") * F.col("size")) / dsum(F.col("size"))
                - F.min("arrival_mid")
            )
            / F.min("arrival_mid")
            * F.lit(10000.0)
        ).alias("vwap_drift_bp"),
    )


@register(
    "arb_executable_pnl_1m",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
v AS (
  SELECT symbol, venue, date_trunc('minute', trade_timestamp) AS w,
         arg_max(bid, {_SQL_LAST_KEY}) AS bid,
         arg_max(ask, {_SQL_LAST_KEY}) AS ask,
         arg_max(bid_size, {_SQL_LAST_KEY}) AS bid_size,
         arg_max(ask_size, {_SQL_LAST_KEY}) AS ask_size
  FROM quotes GROUP BY 1, 2, 3
),
p AS (
  SELECT symbol, w,
         max(CASE WHEN venue = 'coinbase' THEN bid END) AS cb_bid,
         max(CASE WHEN venue = 'coinbase' THEN ask END) AS cb_ask,
         max(CASE WHEN venue = 'coinbase' THEN bid_size END) AS cb_bs,
         max(CASE WHEN venue = 'coinbase' THEN ask_size END) AS cb_as,
         max(CASE WHEN venue = 'binance' THEN bid END) AS bn_bid,
         max(CASE WHEN venue = 'binance' THEN ask END) AS bn_ask,
         max(CASE WHEN venue = 'binance' THEN bid_size END) AS bn_bs,
         max(CASE WHEN venue = 'binance' THEN ask_size END) AS bn_as,
         count(DISTINCT venue) AS n_venues
  FROM v GROUP BY 1, 2
),
x AS (
  SELECT symbol, w,
         CASE WHEN bn_bid - cb_ask > 0.0 THEN 'buy_coinbase'
              WHEN cb_bid - bn_ask > 0.0 THEN 'buy_binance' END AS dir,
         CASE WHEN bn_bid - cb_ask > 0.0
              THEN (bn_bid - cb_ask)
                   * CAST(least(cb_as, bn_bs) AS DOUBLE)
              WHEN cb_bid - bn_ask > 0.0
              THEN (cb_bid - bn_ask)
                   * CAST(least(bn_as, cb_bs) AS DOUBLE)
              ELSE 0.0 END AS pnl,
         CASE WHEN bn_bid - cb_ask > 0.0 THEN least(cb_as, bn_bs)
              WHEN cb_bid - bn_ask > 0.0 THEN least(bn_as, cb_bs)
              ELSE 0 END AS qty
  FROM p WHERE n_venues = 2
)
SELECT symbol,
       count(*) AS n_minutes_both,
       CAST(sum(CASE WHEN dir IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_executable,
       CAST(sum(CASE WHEN dir = 'buy_coinbase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_buy_coinbase,
       CAST(sum(qty) AS BIGINT) AS total_qty,
       {sql_dsum('pnl')} AS total_pnl,
       max(pnl) AS max_minute_pnl
FROM x GROUP BY symbol
""",
    doc="EXECUTABLE cross-venue arbitrage PnL — the title capability's "
    "size-aware form, the number a desk actually trades on: per "
    "(symbol, minute) take each venue's LAST quote (deterministic "
    "composite (ts, trade_id) selection), and when venue A's ask "
    "crosses venue B's bid, the realizable profit is the crossed edge "
    "times the EXECUTABLE size min(A.ask_size, B.bid_size) — lifting "
    "A's offer and hitting B's bid up to displayed depth (at most one "
    "direction can cross per minute: bn_bid > cb_ask implies "
    "cb_bid <= cb_ask < bn_bid <= ... so the two conditions are "
    "mutually exclusive). Per-symbol summary: minutes quoted on both "
    "venues, executable minutes, direction split, total executable "
    "size (exact BIGINT) and PnL (exact-decimal sum; the per-minute "
    "edge*size is one identical IEEE chain in both engines). The "
    "price-only spread twins (arbitrage_spreads_1m, "
    "tick_nbbo_crossed_markets) flag OPPORTUNITY; this one prices it. "
    "One (symbol, venue, minute) reduction, one (symbol, minute) "
    "pivot, one per-symbol rollup — three map-side-combinable "
    "aggregations, no joins.",
    tags=("silver", "finance", "microstructure", "arbitrage", "aggregate"),
)
def arb_executable_pnl_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.determinism import dsum

    q = _quotes(spark, sf_dir)
    v = q.groupBy(
        "symbol",
        "venue",
        F.date_trunc("minute", F.col("trade_timestamp")).alias("w"),
    ).agg(
        F.max_by("bid", _last_key()).alias("bid"),
        F.max_by("ask", _last_key()).alias("ask"),
        F.max_by("bid_size", _last_key()).alias("bid_size"),
        F.max_by("ask_size", _last_key()).alias("ask_size"),
    )

    def side(venue: str, col: str):
        # one row per (symbol, venue, minute) upstream, so max(when) IS
        # the venue's value — no selection-order dependence
        return F.max(F.when(F.col("venue") == venue, F.col(col)))

    p = v.groupBy("symbol", "w").agg(
        side("coinbase", "bid").alias("cb_bid"),
        side("coinbase", "ask").alias("cb_ask"),
        side("coinbase", "bid_size").alias("cb_bs"),
        side("coinbase", "ask_size").alias("cb_as"),
        side("binance", "bid").alias("bn_bid"),
        side("binance", "ask").alias("bn_ask"),
        side("binance", "bid_size").alias("bn_bs"),
        side("binance", "ask_size").alias("bn_as"),
        F.count_distinct(F.col("venue")).alias("n_venues"),
    ).filter(F.col("n_venues") == 2)
    edge_cb = F.col("bn_bid") - F.col("cb_ask")  # buy coinbase, sell binance
    edge_bn = F.col("cb_bid") - F.col("bn_ask")  # buy binance, sell coinbase
    x = p.select(
        "symbol",
        "w",
        F.when(edge_cb > 0.0, F.lit("buy_coinbase"))
        .when(edge_bn > 0.0, F.lit("buy_binance"))
        .alias("dir"),
        F.when(
            edge_cb > 0.0,
            edge_cb * F.least("cb_as", "bn_bs").cast("double"),
        )
        .when(
            edge_bn > 0.0,
            edge_bn * F.least("bn_as", "cb_bs").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("pnl"),
        F.when(edge_cb > 0.0, F.least("cb_as", "bn_bs"))
        .when(edge_bn > 0.0, F.least("bn_as", "cb_bs"))
        .otherwise(F.lit(0))
        .alias("qty"),
    )
    return x.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_minutes_both"),
        F.sum(F.when(F.col("dir").isNotNull(), 1).otherwise(0)).alias(
            "n_executable"
        ),
        F.sum(
            F.when(F.col("dir") == "buy_coinbase", 1).otherwise(0)
        ).alias("n_buy_coinbase"),
        F.sum("qty").alias("total_qty"),
        dsum(F.col("pnl")).alias("total_pnl"),
        F.max("pnl").alias("max_minute_pnl"),
    )


#: Hayashi-Yoshida interval bucketing: the join-bucket width is
#: DATA-ADAPTIVE — the smallest ladder step >= the tape's average
#: inter-tick gap (span // n_intervals, exact BIGINT arithmetic in both
#: engines), capped at one hour. Per-bucket candidate mass is then
#: O(1) per symbol at ANY tick density (the X206 occupancy-adaptive
#: idea applied to time): a fixed width would go quadratic in
#: (rate x width) on dense tapes and explode-heavy on sparse ones. The
#: scalar is one broadcast row, never a driver collect.
_HY_LADDER_US = (
    1_000_000,  # 1 s
    10_000_000,  # 10 s
    60_000_000,  # 1 min
    600_000_000,  # 10 min
    3_600_000_000,  # 1 h cap
)
_SQL_HY_WIDTH = (
    "CASE "
    + " ".join(
        f"WHEN g <= {w} THEN {w}" for w in _HY_LADDER_US[:-1]
    )
    + f" ELSE {_HY_LADDER_US[-1]} END"
)

#: product-term quantizer: 0.01 resolution on the return product. Prices
#: are O(1e3), so |floor(r_a*r_b*100)| <= ~3.1e7 per term and the BIGINT
#: sum stays far inside 2^53 for any plausible pair count (enforced at
#: the float conversion below, never assumed).
_HY_Q = 100.0
_TWO53 = 2**53

#: shared SQL prefix for the HY-family oracles: return intervals (one
#: lag per symbol), HY variances, and the adaptive bucket-width scalar.
_SQL_HY_PREFIX = f"""
t AS (
  SELECT symbol, price, epoch_us(trade_timestamp) AS ts_us, trade_id
  FROM ticks
),
d AS (
  SELECT symbol, ts_us, price,
         lag(price) OVER w AS prev_price,
         lag(ts_us) OVER w AS prev_us
  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY ts_us, trade_id)
),
iv AS (
  SELECT symbol, ts_us, prev_us, price - prev_price AS r
  FROM d WHERE prev_us IS NOT NULL AND prev_us < ts_us
),
vars AS (
  SELECT symbol,
         CAST(SUM(CAST(floor(r * r * {_HY_Q}) AS BIGINT)) AS BIGINT)
           AS var_q,
         count(*) AS n_intervals
  FROM iv GROUP BY symbol
),
sc AS (
  SELECT {{width}} AS w_us
  FROM (SELECT (max(ts_us) - min(prev_us)) // count(*) AS g FROM iv)
)"""


def _hy_iv(
    spark: SparkSession, sf_dir: str, keys: tuple[str, ...] = ("symbol",)
) -> DataFrame:
    """Shared HY-family interval frame: (*keys, ts_us, prev_us, r),
    materialized (``shared``) because variances, the width scalar, and
    the bucket explode all traverse it. One chunked struct-lag per key
    series — the twin of the ``iv`` CTE in ``_SQL_HY_PREFIX`` (and its
    (symbol, venue)-keyed variant for the cross-VENUE estimators)."""
    from ..operators.partitioning import shared
    from ..operators.ticks import events_as_ticks

    t = (
        events_as_ticks(load_table(spark, sf_dir, "events"))
        .select(
            *keys,
            "price",
            F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
            "trade_id",
        )
        .withColumn(
            "__ord",
            F.concat(
                F.lpad(F.col("ts_us").cast("string"), 20, "0"),
                F.lpad(F.col("trade_id").cast("string"), 20, "0"),
                F.coalesce(
                    F.assert_true(
                        (F.col("ts_us") >= 0) & (F.col("trade_id") >= 0),
                        F.lit(
                            "hy intervals: negative ts_us/trade_id breaks "
                            "the lexicographic order key"
                        ),
                    ).cast("string"),
                    F.lit(""),
                ),
            ),
        )
        .withColumn(
            "pv", F.struct(F.col("price"), F.col("ts_us").alias("p_us"))
        )
    )
    return shared(
        chunked_lag(
            t,
            key_cols=list(keys),
            order_col="__ord",
            value_col="pv",
            chunk=F.date_trunc("day", F.timestamp_micros(F.col("ts_us"))),
            out_col="prev",
        )
        .filter(
            F.col("prev").isNotNull() & (F.col("prev.p_us") < F.col("ts_us"))
        )
        .select(
            *keys,
            "ts_us",
            F.col("prev.p_us").alias("prev_us"),
            (F.col("price") - F.col("prev.price")).alias("r"),
        )
    )


def _hy_vars(iv: DataFrame, keys: tuple[str, ...] = ("symbol",)) -> DataFrame:
    return iv.groupBy(*keys).agg(
        F.sum(
            F.floor(F.col("r") * F.col("r") * F.lit(_HY_Q)).cast(
                "decimal(38,0)"
            )
        ).alias("var_q"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def _hy_width(iv: DataFrame) -> DataFrame:
    """1-row adaptive bucket-width frame (w_us), broadcast by callers."""
    width = F.when(F.col("g") <= _HY_LADDER_US[0], _HY_LADDER_US[0])
    for w in _HY_LADDER_US[1:-1]:
        width = width.when(F.col("g") <= w, w)
    width = width.otherwise(_HY_LADDER_US[-1])
    return iv.agg(
        F.expr("(max(ts_us) - min(prev_us)) div count(*)").alias("g")
    ).select(width.alias("w_us"))


def _hy_exact_long(col, query: str, what: str):
    # grid sums accumulate in DECIMAL(38,0) (never wraps) but are
    # EXCHANGED as BIGINT and converted to double for correlations;
    # both are exact only inside 2^53, so enforce it (the OFI/VPIN
    # guard idiom) — loud error, never silent drift
    return (
        col
        + F.coalesce(
            F.assert_true(
                F.abs(col) < F.lit(_TWO53).cast("decimal(38,0)"),
                F.lit(
                    f"{query}: grid sum |{what}| >= 2^53 — long/double "
                    "no longer exact"
                ),
            ).cast("decimal(38,0)"),
            F.lit(0).cast("decimal(38,0)"),
        )
    ).cast("long")


@register(
    "tick_hayashi_yoshida_covariance",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
t AS (
  SELECT symbol, price, epoch_us(trade_timestamp) AS ts_us, trade_id
  FROM ticks
),
d AS (
  SELECT symbol, ts_us, price,
         lag(price) OVER w AS prev_price,
         lag(ts_us) OVER w AS prev_us
  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY ts_us, trade_id)
),
iv AS (
  SELECT symbol, ts_us, prev_us, price - prev_price AS r
  FROM d WHERE prev_us IS NOT NULL AND prev_us < ts_us
),
vars AS (
  SELECT symbol,
         CAST(SUM(CAST(floor(r * r * {_HY_Q}) AS BIGINT)) AS BIGINT)
           AS var_q,
         count(*) AS n_intervals
  FROM iv GROUP BY symbol
),
sc AS (
  SELECT {_SQL_HY_WIDTH} AS w_us
  FROM (SELECT (max(ts_us) - min(prev_us)) // count(*) AS g FROM iv)
),
ivb AS (
  SELECT symbol, ts_us, prev_us, r, w_us,
         unnest(range(prev_us // w_us, ts_us // w_us + 1)) AS bucket
  FROM iv, sc
),
pr AS (
  SELECT a.symbol AS symbol_a, b.symbol AS symbol_b,
         CAST(floor(a.r * b.r * {_HY_Q}) AS BIGINT) AS term
  FROM ivb a JOIN ivb b
    ON a.bucket = b.bucket AND a.symbol < b.symbol
   AND greatest(a.prev_us, b.prev_us) < least(a.ts_us, b.ts_us)
   AND a.bucket * a.w_us <= greatest(a.prev_us, b.prev_us)
   AND greatest(a.prev_us, b.prev_us) < (a.bucket + 1) * a.w_us
),
agg AS (
  SELECT symbol_a, symbol_b, count(*) AS n_pairs,
         CAST(SUM(term) AS BIGINT) AS hy_cov_q
  FROM pr GROUP BY 1, 2
)
SELECT g.symbol_a, g.symbol_b, g.n_pairs, g.hy_cov_q,
       va.n_intervals AS n_intervals_a, vb.n_intervals AS n_intervals_b,
       va.var_q AS hy_var_a_q, vb.var_q AS hy_var_b_q,
       CASE WHEN va.var_q = 0 OR vb.var_q = 0 THEN NULL
            ELSE CAST(g.hy_cov_q AS DOUBLE)
                 / sqrt(CAST(va.var_q AS DOUBLE) * CAST(vb.var_q AS DOUBLE))
       END AS hy_corr
FROM agg g
JOIN vars va ON va.symbol = g.symbol_a
JOIN vars vb ON vb.symbol = g.symbol_b
""",
    doc="Hayashi-Yoshida (2005) asynchronous covariance — the tick-level "
    "refinement of symbol_lead_lag_xcorr's minute grid: cross-venue "
    "tapes never tick simultaneously, and synchronizing them onto a "
    "grid biases covariance toward zero (the Epps effect). HY sums "
    "r_i(A)*r_j(B) over exactly the return-interval pairs whose "
    "(prev_ts, ts] spans OVERLAP — no grid, no interpolation, "
    "consistent under fully asynchronous sampling. Intervals come "
    "from one chunked struct-lag per symbol (scale-safe two-level "
    "form); the overlap join is a TIME-BUCKET equi-join whose width is "
    "DATA-ADAPTIVE — the smallest ladder step (1s..1h) at or above the "
    "tape's average inter-tick gap, one broadcast scalar chosen by "
    "exact BIGINT arithmetic identically in both engines — so "
    "per-bucket candidate mass stays O(1) per symbol at ANY density "
    "(a fixed width would go quadratic in rate x width on dense "
    "tapes). Intervals explode to the buckets they span; a pair is "
    "counted exactly once by crediting the bucket containing the "
    "overlap START, never the tape cross product. Each product quantizes to the exact 0.01 integer grid "
    "(floor, one identical IEEE chain both engines) so the covariance "
    "sum is order-independent BIGINT arithmetic inside DECIMAL(38,0); "
    "HY variances (own-interval r^2, overlap = the interval itself) "
    "ride the same grid, and the HY correlation converts grid sums to "
    "double only behind an assert_true that they sit inside 2^53 "
    "(exact int->double both engines — the OFI moment-guard idiom: "
    "loud error, never silent divergence). Zero-length intervals "
    "(tied microseconds) are dropped identically in both engines.",
    tags=("silver", "finance", "microstructure", "join", "aggregate"),
)
def tick_hayashi_yoshida_covariance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    iv = _hy_iv(spark, sf_dir)
    vars_ = _hy_vars(iv)
    # data-adaptive bucket width: one broadcast scalar row (no driver
    # collect), exact BIGINT ladder choice — identical CASE in the oracle
    sc_df = _hy_width(iv)
    ivb = iv.crossJoin(F.broadcast(sc_df)).select(
        "symbol",
        "ts_us",
        "prev_us",
        "r",
        "w_us",
        F.explode(
            F.expr("sequence(prev_us div w_us, ts_us div w_us)")
        ).alias("bucket"),
    )
    a, b = ivb.alias("a"), ivb.alias("b")
    ostart = F.greatest(F.col("a.prev_us"), F.col("b.prev_us"))
    oend = F.least(F.col("a.ts_us"), F.col("b.ts_us"))
    w_a = F.col("a.w_us")
    pr = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.symbol") < F.col("b.symbol"))
        & (ostart < oend)
        # exactly-once credit: only the bucket containing the overlap
        # START keeps the pair (ts_us >= 0, so div == floor-division and
        # the half-open bucket range test below is the same predicate as
        # the oracle's `a.bucket = greatest(...) // w_us`)
        & (F.col("a.bucket") * w_a <= ostart)
        & (ostart < (F.col("a.bucket") + 1) * w_a),
    ).select(
        F.col("a.symbol").alias("symbol_a"),
        F.col("b.symbol").alias("symbol_b"),
        F.floor(F.col("a.r") * F.col("b.r") * F.lit(_HY_Q)).alias("term"),
    )
    agg = pr.groupBy("symbol_a", "symbol_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("term").cast("decimal(38,0)")).alias("hy_cov_q"),
    )
    va = F.broadcast(vars_).alias("va")
    vb = F.broadcast(vars_).alias("vb")
    g = (
        agg.alias("g")
        .join(va, F.col("va.symbol") == F.col("g.symbol_a"))
        .join(vb, F.col("vb.symbol") == F.col("g.symbol_b"))
    )

    def exact_long(col, what):
        return _hy_exact_long(col, "tick_hayashi_yoshida_covariance", what)

    cov_l = exact_long(F.col("g.hy_cov_q"), "hy_cov_q")
    va_l = exact_long(F.col("va.var_q"), "hy_var_a_q")
    vb_l = exact_long(F.col("vb.var_q"), "hy_var_b_q")
    corr = cov_l.cast("double") / F.sqrt(
        va_l.cast("double") * vb_l.cast("double")
    )
    return g.select(
        "symbol_a",
        "symbol_b",
        "n_pairs",
        cov_l.alias("hy_cov_q"),
        F.col("va.n_intervals").alias("n_intervals_a"),
        F.col("vb.n_intervals").alias("n_intervals_b"),
        va_l.alias("hy_var_a_q"),
        vb_l.alias("hy_var_b_q"),
        F.when(
            (F.col("va.var_q") != 0) & (F.col("vb.var_q") != 0), corr
        ).alias("hy_corr"),
    )


#: taker fee schedule for the net-PnL arb query — documented constants
#: (typical spot taker tiers: 10 bp on coinbase, 7.5 bp on binance).
#: Identical literals in the Spark plan and the oracle SQL, so the fee
#: arithmetic is one identical IEEE chain in both engines.
_FEE_CB = 0.001
_FEE_BN = 0.00075


@register(
    "arb_executable_pnl_net_1m",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
v AS (
  SELECT symbol, venue, date_trunc('minute', trade_timestamp) AS w,
         arg_max(bid, {_SQL_LAST_KEY}) AS bid,
         arg_max(ask, {_SQL_LAST_KEY}) AS ask,
         arg_max(bid_size, {_SQL_LAST_KEY}) AS bid_size,
         arg_max(ask_size, {_SQL_LAST_KEY}) AS ask_size
  FROM quotes GROUP BY 1, 2, 3
),
p AS (
  SELECT symbol, w,
         max(CASE WHEN venue = 'coinbase' THEN bid END) AS cb_bid,
         max(CASE WHEN venue = 'coinbase' THEN ask END) AS cb_ask,
         max(CASE WHEN venue = 'coinbase' THEN bid_size END) AS cb_bs,
         max(CASE WHEN venue = 'coinbase' THEN ask_size END) AS cb_as,
         max(CASE WHEN venue = 'binance' THEN bid END) AS bn_bid,
         max(CASE WHEN venue = 'binance' THEN ask END) AS bn_ask,
         max(CASE WHEN venue = 'binance' THEN bid_size END) AS bn_bs,
         max(CASE WHEN venue = 'binance' THEN ask_size END) AS bn_as,
         count(DISTINCT venue) AS n_venues
  FROM v GROUP BY 1, 2
),
x AS (
  SELECT symbol, w,
         CASE WHEN bn_bid - cb_ask > 0.0 OR cb_bid - bn_ask > 0.0
              THEN 1 ELSE 0 END AS gross_exec,
         bn_bid * (1.0 - {_FEE_BN}) - cb_ask * (1.0 + {_FEE_CB})
           AS net_cb,
         cb_bid * (1.0 - {_FEE_CB}) - bn_ask * (1.0 + {_FEE_BN})
           AS net_bn,
         cb_bid, cb_ask, bn_bid, bn_ask, cb_bs, cb_as, bn_bs, bn_as
  FROM p WHERE n_venues = 2
),
y AS (
  SELECT symbol, w, gross_exec,
         CASE WHEN net_cb > 0.0 THEN 'buy_coinbase'
              WHEN net_bn > 0.0 THEN 'buy_binance' END AS dir,
         CASE WHEN net_cb > 0.0
              THEN net_cb * CAST(least(cb_as, bn_bs) AS DOUBLE)
              WHEN net_bn > 0.0
              THEN net_bn * CAST(least(bn_as, cb_bs) AS DOUBLE)
              ELSE 0.0 END AS net_pnl,
         CASE WHEN net_cb > 0.0
              THEN (bn_bid * {_FEE_BN} + cb_ask * {_FEE_CB})
                   * CAST(least(cb_as, bn_bs) AS DOUBLE)
              WHEN net_bn > 0.0
              THEN (cb_bid * {_FEE_CB} + bn_ask * {_FEE_BN})
                   * CAST(least(bn_as, cb_bs) AS DOUBLE)
              ELSE 0.0 END AS fees,
         CASE WHEN net_cb > 0.0 THEN least(cb_as, bn_bs)
              WHEN net_bn > 0.0 THEN least(bn_as, cb_bs)
              ELSE 0 END AS qty
  FROM x
)
SELECT symbol,
       count(*) AS n_minutes_both,
       CAST(sum(gross_exec) AS BIGINT) AS n_gross_executable,
       CAST(sum(CASE WHEN dir IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_net_executable,
       CAST(sum(CASE WHEN dir = 'buy_coinbase' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_buy_coinbase_net,
       CAST(sum(qty) AS BIGINT) AS total_qty_net,
       {sql_dsum('net_pnl')} AS total_net_pnl,
       {sql_dsum('fees')} AS total_fees,
       max(net_pnl) AS max_minute_net_pnl
FROM y GROUP BY symbol
""",
    doc="FEE-ADJUSTED executable arbitrage PnL — arb_executable_pnl_1m "
    "net of the taker fees both legs actually pay (documented "
    "schedule: 10 bp coinbase, 7.5 bp binance; the buy leg pays on "
    "the ask notional, the sell leg on the bid). A minute executes "
    "only when the NET edge bn_bid*(1-f_bn) - cb_ask*(1+f_cb) (or its "
    "mirror) is positive — the gross-vs-net executable counts quantify "
    "how many raw crossed-market minutes fees erase, which is the "
    "first question a desk asks of any arbitrage detector. Emits net "
    "PnL, total fees paid, and executable size (exact BIGINT; "
    "exact-decimal sums; every per-minute double is one identical IEEE "
    "chain in both engines — the fee factors are literal constants "
    "folded identically). Same three map-side-combinable aggregations "
    "as the gross twin, no joins.",
    tags=("silver", "finance", "microstructure", "arbitrage", "aggregate"),
)
def arb_executable_pnl_net_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.determinism import dsum

    q = _quotes(spark, sf_dir)
    v = q.groupBy(
        "symbol",
        "venue",
        F.date_trunc("minute", F.col("trade_timestamp")).alias("w"),
    ).agg(
        F.max_by("bid", _last_key()).alias("bid"),
        F.max_by("ask", _last_key()).alias("ask"),
        F.max_by("bid_size", _last_key()).alias("bid_size"),
        F.max_by("ask_size", _last_key()).alias("ask_size"),
    )

    def side(venue: str, col: str):
        return F.max(F.when(F.col("venue") == venue, F.col(col)))

    p = v.groupBy("symbol", "w").agg(
        side("coinbase", "bid").alias("cb_bid"),
        side("coinbase", "ask").alias("cb_ask"),
        side("coinbase", "bid_size").alias("cb_bs"),
        side("coinbase", "ask_size").alias("cb_as"),
        side("binance", "bid").alias("bn_bid"),
        side("binance", "ask").alias("bn_ask"),
        side("binance", "bid_size").alias("bn_bs"),
        side("binance", "ask_size").alias("bn_as"),
        F.count_distinct(F.col("venue")).alias("n_venues"),
    ).filter(F.col("n_venues") == 2)
    gross_cb = F.col("bn_bid") - F.col("cb_ask")
    gross_bn = F.col("cb_bid") - F.col("bn_ask")
    net_cb = F.col("bn_bid") * F.lit(1.0 - _FEE_BN) - F.col("cb_ask") * F.lit(
        1.0 + _FEE_CB
    )
    net_bn = F.col("cb_bid") * F.lit(1.0 - _FEE_CB) - F.col("bn_ask") * F.lit(
        1.0 + _FEE_BN
    )
    fees_cb = (
        F.col("bn_bid") * F.lit(_FEE_BN) + F.col("cb_ask") * F.lit(_FEE_CB)
    )
    fees_bn = (
        F.col("cb_bid") * F.lit(_FEE_CB) + F.col("bn_ask") * F.lit(_FEE_BN)
    )
    qty_cb = F.least("cb_as", "bn_bs")
    qty_bn = F.least("bn_as", "cb_bs")
    y = p.select(
        "symbol",
        "w",
        F.when((gross_cb > 0.0) | (gross_bn > 0.0), 1)
        .otherwise(0)
        .alias("gross_exec"),
        F.when(net_cb > 0.0, F.lit("buy_coinbase"))
        .when(net_bn > 0.0, F.lit("buy_binance"))
        .alias("dir"),
        F.when(net_cb > 0.0, net_cb * qty_cb.cast("double"))
        .when(net_bn > 0.0, net_bn * qty_bn.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("net_pnl"),
        F.when(net_cb > 0.0, fees_cb * qty_cb.cast("double"))
        .when(net_bn > 0.0, fees_bn * qty_bn.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("fees"),
        F.when(net_cb > 0.0, qty_cb)
        .when(net_bn > 0.0, qty_bn)
        .otherwise(F.lit(0))
        .alias("qty"),
    )
    return y.groupBy("symbol").agg(
        F.count(F.lit(1)).alias("n_minutes_both"),
        F.sum("gross_exec").alias("n_gross_executable"),
        F.sum(F.when(F.col("dir").isNotNull(), 1).otherwise(0)).alias(
            "n_net_executable"
        ),
        F.sum(
            F.when(F.col("dir") == "buy_coinbase", 1).otherwise(0)
        ).alias("n_buy_coinbase_net"),
        F.sum("qty").alias("total_qty_net"),
        dsum(F.col("net_pnl")).alias("total_net_pnl"),
        dsum(F.col("fees")).alias("total_fees"),
        F.max("net_pnl").alias("max_minute_net_pnl"),
    )


#: Epps-curve sampling grid (seconds) and return quantizer (0.01 grid).
_EPPS_INTERVALS_S = (60, 300, 900, 3600)
_EPPS_Q = 100.0
#: |quantized grid return| bound: keeps every x*x and every moment sum
#: exact inside BIGINT (and the moments inside 2^53 for the exact
#: int->double conversion) at any plausible grid length.
_EPPS_XMAX = 1_000_000
_SQL_EPPS_INTERVALS = ", ".join(str(s) for s in _EPPS_INTERVALS_S)


@register(
    "symbol_epps_effect_curve",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
t AS (
  SELECT symbol, price, epoch_us(trade_timestamp) AS ts_us, trade_id
  FROM ticks
),
g AS (
  SELECT symbol, dt.dt_s, ts_us // (CAST(dt.dt_s AS BIGINT) * 1000000) AS bucket,
         arg_max(price, {_SQL_LAST_KEY.replace('epoch_us(trade_timestamp)', 'ts_us')}) AS p
  FROM t, (SELECT unnest([{_SQL_EPPS_INTERVALS}]) AS dt_s) dt
  GROUP BY 1, 2, 3
),
r AS (
  SELECT symbol, dt_s, bucket,
         CAST(floor((p - lag(p) OVER w) * {_EPPS_Q}) AS BIGINT) AS x,
         bucket - lag(bucket) OVER w AS db
  FROM g WINDOW w AS (PARTITION BY symbol, dt_s ORDER BY bucket)
),
rr AS (SELECT symbol, dt_s, bucket, x FROM r WHERE db = 1),
pr AS (
  SELECT a.symbol AS symbol_a, b.symbol AS symbol_b, a.dt_s,
         a.x AS xa, b.x AS xb
  FROM rr a JOIN rr b
    ON a.dt_s = b.dt_s AND a.bucket = b.bucket AND a.symbol < b.symbol
),
m AS (
  SELECT symbol_a, symbol_b, dt_s, count(*) AS n,
         CAST(sum(xa) AS BIGINT) AS sx, CAST(sum(xb) AS BIGINT) AS sy,
         CAST(sum(xa * xb) AS BIGINT) AS sxy,
         CAST(sum(xa * xa) AS BIGINT) AS sxx,
         CAST(sum(xb * xb) AS BIGINT) AS syy
  FROM pr GROUP BY 1, 2, 3
)
SELECT symbol_a, symbol_b, CAST(dt_s AS BIGINT) AS interval_s, n AS n_common,
       CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0.0
             AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                 - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0.0
            THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                        * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
       END AS epps_corr
FROM m
""",
    doc="Epps (1979) effect curve — the companion diagnostic to "
    "tick_hayashi_yoshida_covariance: return correlations measured on "
    "a sampling grid SHRINK as the grid gets finer, because "
    "asynchronous ticks decouple fine-grained returns (the bias HY "
    "removes). Per symbol pair and per interval in {60s, 5m, 15m, 1h}: "
    "last price per grid bucket (composite (ts, trade_id) selection), "
    "returns over ADJACENT observed buckets only (bucket gap = 1 — no "
    "interpolation, both engines drop gaps identically), each return "
    "floor-quantized to the exact 0.01 grid so ALL five correlation "
    "moments are exact BIGINT arithmetic (|x| <= 1e6 ENFORCED — the "
    "OFI moment-guard idiom); the Pearson correlation converts exact "
    "moments to double in one identical IEEE chain (the Kyle-lambda "
    "OLS convention). Plotting epps_corr against interval_s gives the "
    "canonical rising curve whose asymptote the HY estimator reads "
    "off directly. One tick reduction (map-side combinable), one "
    "chunk-decomposed lag over the bucket summary, one grid-bucket "
    "equi-join bounded by grid length — never tick volume.",
    tags=("silver", "finance", "microstructure", "window-function", "join"),
)
def symbol_epps_effect_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.partitioning import shared
    from ..operators.ticks import events_as_ticks

    t = events_as_ticks(load_table(spark, sf_dir, "events")).select(
        "symbol",
        "price",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
    )
    g = (
        t.select(
            "symbol",
            "price",
            "ts_us",
            "trade_id",
            F.explode(
                F.array(
                    *[F.lit(s).cast("long") for s in _EPPS_INTERVALS_S]
                )
            ).alias("dt_s"),
        )
        .groupBy(
            "symbol",
            "dt_s",
            F.expr("ts_us div (dt_s * 1000000)").alias("bucket"),
        )
        .agg(
            F.max_by(
                "price", F.struct(F.col("ts_us"), F.col("trade_id"))
            ).alias("p")
        )
    )
    rr = shared(
        chunked_lag(
            g.withColumn("bp", F.struct(F.col("bucket"), F.col("p"))),
            key_cols=["symbol", "dt_s"],
            order_col="bucket",
            value_col="bp",
            chunk=F.expr("bucket div 1024"),
            out_col="prev",
        )
        .filter(
            F.col("prev").isNotNull()
            & (F.col("prev.bucket") == F.col("bucket") - 1)
        )
        .select(
            "symbol",
            "dt_s",
            "bucket",
            (
                F.floor((F.col("p") - F.col("prev.p")) * F.lit(_EPPS_Q))
                + F.coalesce(
                    F.assert_true(
                        F.abs(
                            F.floor(
                                (F.col("p") - F.col("prev.p"))
                                * F.lit(_EPPS_Q)
                            )
                        )
                        <= F.lit(_EPPS_XMAX),
                        F.lit(
                            "symbol_epps_effect_curve: |grid return| > "
                            "1e6 overflows the exact BIGINT moments"
                        ),
                    ).cast("long"),
                    F.lit(0),
                )
            ).alias("x"),
        )
    )
    a, b = rr.alias("a"), rr.alias("b")
    pr = a.join(
        b,
        (F.col("a.dt_s") == F.col("b.dt_s"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.symbol") < F.col("b.symbol")),
    ).select(
        F.col("a.symbol").alias("symbol_a"),
        F.col("b.symbol").alias("symbol_b"),
        F.col("a.dt_s").alias("dt_s"),
        F.col("a.x").alias("xa"),
        F.col("b.x").alias("xb"),
    )
    m = pr.groupBy("symbol_a", "symbol_b", "dt_s").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").alias("sx"),
        F.sum("xb").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).alias("syy"),
    )
    n_d = F.col("n").cast("double")
    sx_d, sy_d = F.col("sx").cast("double"), F.col("sy").cast("double")
    denx = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    deny = n_d * F.col("syy").cast("double") - sy_d * sy_d
    corr = (n_d * F.col("sxy").cast("double") - sx_d * sy_d) / F.sqrt(
        denx * deny
    )
    return m.select(
        "symbol_a",
        "symbol_b",
        F.col("dt_s").alias("interval_s"),
        F.col("n").alias("n_common"),
        F.when((denx > 0.0) & (deny > 0.0), corr).alias("epps_corr"),
    )


#: lead-lag ladder (seconds): negative = symbol_b shifted back in time
#: (tests whether A's returns correlate with B's EARLIER returns, i.e.
#: B leads A); positive = B shifted forward (A leads B).
_HRY_LAGS_S = (-60, -10, 0, 10, 60)
_SQL_HRY_LAGS = ", ".join(str(s) for s in _HRY_LAGS_S)


@register(
    "tick_lead_lag_hy",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
{_SQL_HY_PREFIX.format(width=_SQL_HY_WIDTH)},
iva AS (
  SELECT symbol, ts_us, prev_us, r, w_us,
         unnest(range(prev_us // w_us, ts_us // w_us + 1)) AS bucket
  FROM iv, sc
),
lgs AS (SELECT unnest([{_SQL_HRY_LAGS}]) AS lag_s),
ivb AS (
  SELECT symbol, r, lag_s, w_us,
         ts_us - CAST(lag_s AS BIGINT) * 1000000 AS st,
         prev_us - CAST(lag_s AS BIGINT) * 1000000 AS sp,
         unnest(range((prev_us - CAST(lag_s AS BIGINT) * 1000000) // w_us,
                      (ts_us - CAST(lag_s AS BIGINT) * 1000000) // w_us + 1))
           AS bucket
  FROM iv, sc, lgs
),
pr AS (
  SELECT a.symbol AS symbol_a, b.symbol AS symbol_b, b.lag_s,
         CAST(floor(a.r * b.r * {_HY_Q}) AS BIGINT) AS term
  FROM iva a JOIN ivb b
    ON a.bucket = b.bucket AND a.symbol < b.symbol
   AND greatest(a.prev_us, b.sp) < least(a.ts_us, b.st)
   AND a.bucket * a.w_us <= greatest(a.prev_us, b.sp)
   AND greatest(a.prev_us, b.sp) < (a.bucket + 1) * a.w_us
),
agg AS (
  SELECT symbol_a, symbol_b, lag_s, count(*) AS n_pairs,
         CAST(SUM(term) AS BIGINT) AS hy_cov_q
  FROM pr GROUP BY 1, 2, 3
)
SELECT g.symbol_a, g.symbol_b, CAST(g.lag_s AS BIGINT) AS lag_s,
       g.n_pairs, g.hy_cov_q,
       CASE WHEN va.var_q = 0 OR vb.var_q = 0 THEN NULL
            ELSE CAST(g.hy_cov_q AS DOUBLE)
                 / sqrt(CAST(va.var_q AS DOUBLE) * CAST(vb.var_q AS DOUBLE))
       END AS hy_corr
FROM agg g
JOIN vars va ON va.symbol = g.symbol_a
JOIN vars vb ON vb.symbol = g.symbol_b
""",
    doc="Lead-lag Hayashi-Yoshida contrast curve (Hoffmann-Rosenbaum-"
    "Yoshida 2013): the HY covariance re-evaluated with symbol_b's "
    "return intervals TIME-SHIFTED by each lag in {-60s, -10s, 0, "
    "+10s, +60s} — the lag maximizing |correlation| estimates which "
    "series leads and by how much, the tick-level answer to the "
    "question symbol_lead_lag_xcorr approximates on a minute grid "
    "(and the curve whose peak a cross-venue arbitrage desk watches). "
    "Machinery shared with tick_hayashi_yoshida_covariance "
    "(_hy_iv/_hy_vars/_hy_width): same chunked struct-lag intervals, "
    "same data-adaptive bucket width, same exactly-once overlap-start "
    "credit, same 0.01-grid BIGINT product sums and 2^53-guarded "
    "correlation — the b side simply fans out 5 shifted copies before "
    "bucketing, so candidate mass is 5x the unshifted join, still "
    "O(1) per bucket per symbol. Unshifted HY variances normalize "
    "every lag (the HRY convention).",
    tags=("silver", "finance", "microstructure", "join", "aggregate"),
)
def tick_lead_lag_hy(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _hy_iv(spark, sf_dir)
    vars_ = _hy_vars(iv)
    sc_df = _hy_width(iv)
    iva = iv.crossJoin(F.broadcast(sc_df)).select(
        "symbol",
        "ts_us",
        "prev_us",
        "r",
        "w_us",
        F.explode(
            F.expr("sequence(prev_us div w_us, ts_us div w_us)")
        ).alias("bucket"),
    )
    ivb = (
        iv.crossJoin(F.broadcast(sc_df))
        .select(
            "symbol",
            "r",
            "w_us",
            "ts_us",
            "prev_us",
            F.explode(
                F.array(*[F.lit(s).cast("long") for s in _HRY_LAGS_S])
            ).alias("lag_s"),
        )
        .select(
            "symbol",
            "r",
            "w_us",
            "lag_s",
            (F.col("ts_us") - F.col("lag_s") * F.lit(1_000_000)).alias("st"),
            (F.col("prev_us") - F.col("lag_s") * F.lit(1_000_000)).alias(
                "sp"
            ),
        )
        .select(
            "symbol",
            "r",
            "w_us",
            "lag_s",
            "st",
            "sp",
            F.explode(F.expr("sequence(sp div w_us, st div w_us)")).alias(
                "bucket"
            ),
        )
    )
    a, b = iva.alias("a"), ivb.alias("b")
    ostart = F.greatest(F.col("a.prev_us"), F.col("b.sp"))
    oend = F.least(F.col("a.ts_us"), F.col("b.st"))
    w_a = F.col("a.w_us")
    pr = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket"))
        & (F.col("a.symbol") < F.col("b.symbol"))
        & (ostart < oend)
        & (F.col("a.bucket") * w_a <= ostart)
        & (ostart < (F.col("a.bucket") + 1) * w_a),
    ).select(
        F.col("a.symbol").alias("symbol_a"),
        F.col("b.symbol").alias("symbol_b"),
        F.col("b.lag_s").alias("lag_s"),
        F.floor(F.col("a.r") * F.col("b.r") * F.lit(_HY_Q)).alias("term"),
    )
    agg = pr.groupBy("symbol_a", "symbol_b", "lag_s").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("term").cast("decimal(38,0)")).alias("hy_cov_q"),
    )
    va = F.broadcast(vars_).alias("va")
    vb = F.broadcast(vars_).alias("vb")
    g = (
        agg.alias("g")
        .join(va, F.col("va.symbol") == F.col("g.symbol_a"))
        .join(vb, F.col("vb.symbol") == F.col("g.symbol_b"))
    )
    cov_l = _hy_exact_long(
        F.col("g.hy_cov_q"), "tick_lead_lag_hy", "hy_cov_q"
    )
    va_l = _hy_exact_long(F.col("va.var_q"), "tick_lead_lag_hy", "var_a")
    vb_l = _hy_exact_long(F.col("vb.var_q"), "tick_lead_lag_hy", "var_b")
    corr = cov_l.cast("double") / F.sqrt(
        va_l.cast("double") * vb_l.cast("double")
    )
    return g.select(
        "symbol_a",
        "symbol_b",
        "lag_s",
        "n_pairs",
        cov_l.alias("hy_cov_q"),
        F.when(
            (F.col("va.var_q") != 0) & (F.col("vb.var_q") != 0), corr
        ).alias("hy_corr"),
    )


@register(
    "tick_imbalance_forward_returns",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
t AS (
  SELECT symbol, epoch_us(trade_timestamp) AS ts_us, trade_id,
         mid, bid_size, ask_size
  FROM quotes
),
d AS (
  SELECT symbol, ts_us, trade_id, mid,
         lag(mid) OVER w AS pm,
         lag(bid_size) OVER w AS pbs,
         lag(ask_size) OVER w AS pas
  FROM t WINDOW w AS (PARTITION BY symbol ORDER BY ts_us, trade_id)
),
e AS (
  SELECT symbol,
         least(4, ((pbs - pas + pbs + pas) * 5) // (2 * (pbs + pas)))
           AS imb_bucket,
         mid - pm AS dmid
  FROM d WHERE pm IS NOT NULL
)
SELECT symbol, imb_bucket,
       count(*) AS n_quotes,
       CAST(sum(CASE WHEN dmid > 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(sum(CASE WHEN dmid < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       {sql_davg('dmid')} AS avg_fwd_mid_chg
FROM e GROUP BY 1, 2
""",
    doc="Book-imbalance-conditioned forward returns — the empirical "
    "companion to tick_order_flow_imbalance: does displayed depth "
    "imbalance predict the NEXT mid move? Each quote's imbalance "
    "(bid_size - ask_size)/(bid_size + ask_size) is bucketed into 5 "
    "equal cells by EXACT integer cross-multiplication "
    "(((bs-as)+(bs+as))*5 div (2*(bs+as)) — no float division, no "
    "boundary ambiguity; sizes are positive integers so truncating "
    "div == floor div in both engines), and the SUBSEQUENT "
    "quote-to-quote mid change is attributed back to it via one "
    "chunked struct-lag (the forward return of quote t-1 IS the "
    "backward difference at t — no lead operator needed). Per "
    "(symbol, bucket): count, up/down counts, and the exact-decimal "
    "average forward mid change (|dmid| is price-bounded, davg-safe). "
    "Monotone avg_fwd_mid_chg across buckets is the classic depth-"
    "imbalance predictability result. One tick-level lag, one "
    "map-side-combinable aggregation.",
    tags=("silver", "finance", "microstructure", "window-function"),
)
def tick_imbalance_forward_returns(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    t = _quotes(spark, sf_dir).select(
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
        "mid",
        "bid_size",
        "ask_size",
    ).withColumn(
        "__ord",
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lpad(F.col("trade_id").cast("string"), 20, "0"),
            F.coalesce(
                F.assert_true(
                    (F.col("ts_us") >= 0) & (F.col("trade_id") >= 0),
                    F.lit(
                        "tick_imbalance_forward_returns: negative ts_us/"
                        "trade_id breaks the lexicographic order key"
                    ),
                ).cast("string"),
                F.lit(""),
            ),
        ),
    ).withColumn(
        "q3",
        F.struct(F.col("mid"), F.col("bid_size"), F.col("ask_size")),
    )
    d = chunked_lag(
        t,
        key_cols=["symbol"],
        order_col="__ord",
        value_col="q3",
        chunk=F.date_trunc("day", F.timestamp_micros(F.col("ts_us"))),
        out_col="pq",
    ).filter(F.col("pq").isNotNull())
    bucket = F.least(
        F.lit(4).cast("long"),
        F.expr(
            "((pq.bid_size - pq.ask_size + pq.bid_size + pq.ask_size) * 5)"
            " div (2 * (pq.bid_size + pq.ask_size))"
        ),
    )
    e = d.select(
        "symbol",
        bucket.alias("imb_bucket"),
        (F.col("mid") - F.col("pq.mid")).alias("dmid"),
    )
    return e.groupBy("symbol", "imb_bucket").agg(
        F.count(F.lit(1)).alias("n_quotes"),
        F.sum(F.when(F.col("dmid") > 0.0, 1).otherwise(0)).alias("n_up"),
        F.sum(F.when(F.col("dmid") < 0.0, 1).otherwise(0)).alias("n_down"),
        davg(F.col("dmid")).alias("avg_fwd_mid_chg"),
    )


@register(
    "tick_cross_venue_staleness",
    oracle=f"""
WITH {EVENTS_QUOTES_CTE},
m AS (
  SELECT symbol, venue, epoch_us(trade_timestamp) AS ts_us, trade_id,
         CASE WHEN venue = 'coinbase'
              THEN epoch_us(trade_timestamp) END AS cb_ts,
         CASE WHEN venue = 'binance'
              THEN epoch_us(trade_timestamp) END AS bn_ts
  FROM quotes
),
f AS (
  SELECT symbol, venue, ts_us,
         last_value(cb_ts IGNORE NULLS) OVER w AS last_cb,
         last_value(bn_ts IGNORE NULLS) OVER w AS last_bn
  FROM m
  WINDOW w AS (PARTITION BY symbol ORDER BY ts_us, trade_id
               ROWS UNBOUNDED PRECEDING)
),
s AS (
  SELECT symbol, venue, ts_us,
         ts_us - CASE WHEN venue = 'coinbase' THEN last_bn
                      ELSE last_cb END AS stale_us
  FROM f
)
SELECT symbol, venue,
       count(*) AS n_quotes,
       CAST(sum(CASE WHEN stale_us IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_with_ref,
       CAST(sum(stale_us) AS BIGINT) AS total_stale_us,
       CAST(CAST(sum(stale_us) AS BIGINT) AS DOUBLE)
         / CAST(sum(CASE WHEN stale_us IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) AS avg_stale_us,
       max(stale_us) AS max_stale_us
FROM s GROUP BY 1, 2
""",
    doc="Cross-venue quote staleness — the latency dial behind phantom "
    "arbitrage: at each quote event, how old is the OTHER venue's most "
    "recent quote for the same symbol? A crossed market flagged "
    "against a stale opposite side is an opportunity that was already "
    "gone (the reference's detector, reading one merged stream, never "
    "measures this). The merged per-symbol stream carries each "
    "venue's last quote time forward with TWO chunk-decomposed LOCF "
    "passes (operators/rolling.chunked_locf — parallel over symbol x "
    "day chunks, sequential only over the chunk summary), keyed by "
    "the composite (ts, trade_id) order so microsecond ties resolve "
    "identically in both engines; staleness is an exact integer "
    "microsecond difference. Per (symbol, venue): quote count, quotes "
    "with an opposite-side reference, exact total/max staleness, and "
    "the average as one division of exact integers (total enforced "
    "inside 2^53 — the OFI guard idiom). Rows before a venue's first "
    "opposite quote stay unreferenced, identically in both engines.",
    tags=("silver", "finance", "microstructure", "window-function"),
)
def tick_cross_venue_staleness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.rolling import chunked_locf

    q = _quotes(spark, sf_dir).select(
        "symbol",
        "venue",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
    ).withColumn(
        "__ord",
        F.concat(
            F.lpad(F.col("ts_us").cast("string"), 20, "0"),
            F.lpad(F.col("trade_id").cast("string"), 20, "0"),
            F.coalesce(
                F.assert_true(
                    (F.col("ts_us") >= 0) & (F.col("trade_id") >= 0),
                    F.lit(
                        "tick_cross_venue_staleness: negative ts_us/"
                        "trade_id breaks the lexicographic order key"
                    ),
                ).cast("string"),
                F.lit(""),
            ),
        ),
    ).withColumn(
        "cb_ts",
        F.when(F.col("venue") == "coinbase", F.col("ts_us")),
    ).withColumn(
        "bn_ts",
        F.when(F.col("venue") == "binance", F.col("ts_us")),
    )
    chunk = F.date_trunc("day", F.timestamp_micros(F.col("ts_us")))
    f1 = chunked_locf(
        q,
        key_cols=["symbol"],
        order_col="__ord",
        value_col="cb_ts",
        chunk=chunk,
        out_col="last_cb",
    )
    f2 = chunked_locf(
        f1,
        key_cols=["symbol"],
        order_col="__ord",
        value_col="bn_ts",
        chunk=chunk,
        out_col="last_bn",
    )
    stale = F.col("ts_us") - F.when(
        F.col("venue") == "coinbase", F.col("last_bn")
    ).otherwise(F.col("last_cb"))
    s = f2.select("symbol", "venue", stale.alias("stale_us"))
    total = F.sum("stale_us")
    guarded_total = total + F.coalesce(
        F.assert_true(
            F.abs(total) < F.lit(_TWO53),
            F.lit(
                "tick_cross_venue_staleness: total staleness >= 2^53 — "
                "the avg division is no longer exact-int-operand"
            ),
        ).cast("long"),
        F.lit(0),
    )
    n_ref = F.sum(F.when(F.col("stale_us").isNotNull(), 1).otherwise(0))
    return s.groupBy("symbol", "venue").agg(
        F.count(F.lit(1)).alias("n_quotes"),
        n_ref.alias("n_with_ref"),
        guarded_total.alias("total_stale_us"),
        (guarded_total.cast("double") / n_ref.cast("double")).alias(
            "avg_stale_us"
        ),
        F.max("stale_us").alias("max_stale_us"),
    )


@register(
    "tick_venue_lead_lag_hy",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
t AS (
  SELECT symbol, venue, price, epoch_us(trade_timestamp) AS ts_us,
         trade_id
  FROM ticks
),
d AS (
  SELECT symbol, venue, ts_us, price,
         lag(price) OVER w AS prev_price,
         lag(ts_us) OVER w AS prev_us
  FROM t WINDOW w AS (PARTITION BY symbol, venue
                      ORDER BY ts_us, trade_id)
),
iv AS (
  SELECT symbol, venue, ts_us, prev_us, price - prev_price AS r
  FROM d WHERE prev_us IS NOT NULL AND prev_us < ts_us
),
vars AS (
  SELECT symbol, venue,
         CAST(SUM(CAST(floor(r * r * {_HY_Q}) AS BIGINT)) AS BIGINT)
           AS var_q
  FROM iv GROUP BY 1, 2
),
sc AS (
  SELECT {_SQL_HY_WIDTH} AS w_us
  FROM (SELECT (max(ts_us) - min(prev_us)) // count(*) AS g FROM iv)
),
iva AS (
  SELECT symbol, ts_us, prev_us, r, w_us,
         unnest(range(prev_us // w_us, ts_us // w_us + 1)) AS bucket
  FROM iv, sc WHERE venue = 'coinbase'
),
lgs AS (SELECT unnest([{_SQL_HRY_LAGS}]) AS lag_s),
ivb AS (
  SELECT symbol, r, lag_s, w_us,
         ts_us - CAST(lag_s AS BIGINT) * 1000000 AS st,
         prev_us - CAST(lag_s AS BIGINT) * 1000000 AS sp,
         unnest(range((prev_us - CAST(lag_s AS BIGINT) * 1000000) // w_us,
                      (ts_us - CAST(lag_s AS BIGINT) * 1000000) // w_us + 1))
           AS bucket
  FROM iv, sc, lgs WHERE venue = 'binance'
),
pr AS (
  SELECT a.symbol, b.lag_s,
         CAST(floor(a.r * b.r * {_HY_Q}) AS BIGINT) AS term
  FROM iva a JOIN ivb b
    ON a.symbol = b.symbol AND a.bucket = b.bucket
   AND greatest(a.prev_us, b.sp) < least(a.ts_us, b.st)
   AND a.bucket * a.w_us <= greatest(a.prev_us, b.sp)
   AND greatest(a.prev_us, b.sp) < (a.bucket + 1) * a.w_us
),
agg AS (
  SELECT symbol, lag_s, count(*) AS n_pairs,
         CAST(SUM(term) AS BIGINT) AS hy_cov_q
  FROM pr GROUP BY 1, 2
)
SELECT g.symbol, CAST(g.lag_s AS BIGINT) AS lag_s, g.n_pairs, g.hy_cov_q,
       CASE WHEN va.var_q = 0 OR vb.var_q = 0 THEN NULL
            ELSE CAST(g.hy_cov_q AS DOUBLE)
                 / sqrt(CAST(va.var_q AS DOUBLE) * CAST(vb.var_q AS DOUBLE))
       END AS hy_corr
FROM agg g
JOIN vars va ON va.symbol = g.symbol AND va.venue = 'coinbase'
JOIN vars vb ON vb.symbol = g.symbol AND vb.venue = 'binance'
""",
    doc="Cross-VENUE lead-lag Hayashi-Yoshida — the title question "
    "itself, answered at tick level: for each symbol, does coinbase "
    "lead binance or vice versa, and by how much? The same symbol's "
    "two venue tapes form the asynchronous pair (coinbase unshifted, "
    "binance time-shifted over the -60s..+60s HRY ladder); the "
    "|corr|-maximizing lag is the venue latency a cross-venue "
    "arbitrage strategy must beat — positive-lag peak means coinbase "
    "moves first (arbitrage flows coinbase -> binance), the quantity "
    "tick_cross_venue_staleness bounds from the quote side. Per-"
    "(symbol, venue) interval series from one chunked struct-lag; "
    "same adaptive bucket width, exactly-once overlap-start credit, "
    "0.01-grid BIGINT sums, 2^53-guarded correlation as the whole HY "
    "family; per-venue variances normalize each symbol's curve.",
    tags=("silver", "finance", "microstructure", "arbitrage", "join"),
)
def tick_venue_lead_lag_hy(spark: SparkSession, sf_dir: str) -> DataFrame:
    iv = _hy_iv(spark, sf_dir, keys=("symbol", "venue"))
    vars_ = _hy_vars(iv, keys=("symbol", "venue"))
    sc_df = _hy_width(iv)
    iva = (
        iv.filter(F.col("venue") == "coinbase")
        .crossJoin(F.broadcast(sc_df))
        .select(
            "symbol",
            "ts_us",
            "prev_us",
            "r",
            "w_us",
            F.explode(
                F.expr("sequence(prev_us div w_us, ts_us div w_us)")
            ).alias("bucket"),
        )
    )
    ivb = (
        iv.filter(F.col("venue") == "binance")
        .crossJoin(F.broadcast(sc_df))
        .select(
            "symbol",
            "r",
            "w_us",
            "ts_us",
            "prev_us",
            F.explode(
                F.array(*[F.lit(s).cast("long") for s in _HRY_LAGS_S])
            ).alias("lag_s"),
        )
        .select(
            "symbol",
            "r",
            "w_us",
            "lag_s",
            (F.col("ts_us") - F.col("lag_s") * F.lit(1_000_000)).alias("st"),
            (F.col("prev_us") - F.col("lag_s") * F.lit(1_000_000)).alias(
                "sp"
            ),
        )
        .select(
            "symbol",
            "r",
            "w_us",
            "lag_s",
            "st",
            "sp",
            F.explode(F.expr("sequence(sp div w_us, st div w_us)")).alias(
                "bucket"
            ),
        )
    )
    a, b = iva.alias("a"), ivb.alias("b")
    ostart = F.greatest(F.col("a.prev_us"), F.col("b.sp"))
    oend = F.least(F.col("a.ts_us"), F.col("b.st"))
    w_a = F.col("a.w_us")
    pr = a.join(
        b,
        (F.col("a.symbol") == F.col("b.symbol"))
        & (F.col("a.bucket") == F.col("b.bucket"))
        & (ostart < oend)
        & (F.col("a.bucket") * w_a <= ostart)
        & (ostart < (F.col("a.bucket") + 1) * w_a),
    ).select(
        F.col("a.symbol").alias("symbol"),
        F.col("b.lag_s").alias("lag_s"),
        F.floor(F.col("a.r") * F.col("b.r") * F.lit(_HY_Q)).alias("term"),
    )
    agg = pr.groupBy("symbol", "lag_s").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.col("term").cast("decimal(38,0)")).alias("hy_cov_q"),
    )
    va = F.broadcast(
        vars_.filter(F.col("venue") == "coinbase").drop("venue")
    ).alias("va")
    vb = F.broadcast(
        vars_.filter(F.col("venue") == "binance").drop("venue")
    ).alias("vb")
    g = (
        agg.alias("g")
        .join(va, F.col("va.symbol") == F.col("g.symbol"))
        .join(vb, F.col("vb.symbol") == F.col("g.symbol"))
    )
    cov_l = _hy_exact_long(
        F.col("g.hy_cov_q"), "tick_venue_lead_lag_hy", "hy_cov_q"
    )
    va_l = _hy_exact_long(
        F.col("va.var_q"), "tick_venue_lead_lag_hy", "var_cb"
    )
    vb_l = _hy_exact_long(
        F.col("vb.var_q"), "tick_venue_lead_lag_hy", "var_bn"
    )
    corr = cov_l.cast("double") / F.sqrt(
        va_l.cast("double") * vb_l.cast("double")
    )
    return g.select(
        F.col("g.symbol").alias("symbol"),
        "lag_s",
        "n_pairs",
        cov_l.alias("hy_cov_q"),
        F.when(
            (F.col("va.var_q") != 0) & (F.col("vb.var_q") != 0), corr
        ).alias("hy_corr"),
    )
