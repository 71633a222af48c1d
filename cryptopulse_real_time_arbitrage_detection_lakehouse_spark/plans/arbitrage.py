"""Capability-gap queries: the features the reference claims but never
implements (SURVEY.md section 0.1 / 2.6) — arbitrage spreads, as-of joins,
dedup, venue union/pivot — each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import davg, fmt_ts, sql_davg, sql_dsum, sql_fmt_ts
from ..operators.arbitrage import arbitrage_spreads
from ..operators.asof import asof_join
from ..operators.dedup import dedup_exact
from ..operators.partitioning import shared
from ..operators.ticks import EVENTS_TICKS_CTE, events_as_ticks
from ..sources.testdata import load_table
from .registry import register


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_ticks(load_table(spark, sf_dir, "events"))


_VWAP_SQL = f"{sql_dsum('price * size')} / {sql_dsum('size')}"

_VENUE_VWAP_CTE = f"""
vw AS (
  SELECT venue, symbol, date_trunc('minute', trade_timestamp) AS window_start,
         {_VWAP_SQL} AS vwap, count(*) AS trade_count
  FROM ticks
  GROUP BY 1, 2, 3
)
"""


@register(
    "arbitrage_spreads_1m",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
{_VENUE_VWAP_CTE}
SELECT a.symbol,
       {sql_fmt_ts("a.window_start")} AS window_start,
       a.vwap AS vwap_a, b.vwap AS vwap_b,
       a.trade_count AS trades_a, b.trade_count AS trades_b,
       a.vwap - b.vwap AS spread,
       abs(a.vwap - b.vwap) / least(a.vwap, b.vwap) AS rel_spread
FROM vw a JOIN vw b ON a.symbol = b.symbol AND a.window_start = b.window_start
WHERE a.venue = 'coinbase' AND b.venue = 'binance'
  AND abs(a.vwap - b.vwap) / least(a.vwap, b.vwap) > 0.05
""",
    doc="THE title capability: cross-venue VWAP spread per (symbol, 1-min "
    "window) with threshold filter (SURVEY.md 2.6 — absent from the "
    "reference). Join runs on pre-aggregated venue candles.",
    tags=("arbitrage", "join", "aggregate"),
)
def arbitrage_spreads_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    sp = arbitrage_spreads(_ticks(spark, sf_dir), min_rel_spread=0.05)
    return sp.select(
        "symbol",
        fmt_ts("window_start", "window_start"),
        "vwap_a",
        "vwap_b",
        "trades_a",
        "trades_b",
        "spread",
        "rel_spread",
    )


@register(
    "asof_last_click_before_purchase",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
p AS (SELECT * FROM ticks WHERE taker_side = 'purchase'),
c AS (SELECT * FROM ticks WHERE taker_side = 'click')
SELECT p.trade_id, p.symbol, epoch_us(p.trade_timestamp) AS ts_us, p.price,
       c.price AS price_right, epoch_us(c.trade_timestamp) AS click_ts_us
FROM p ASOF JOIN c
  ON p.symbol = c.symbol AND c.trade_timestamp <= p.trade_timestamp
WHERE p.trade_timestamp - c.trade_timestamp <= INTERVAL 3600 SECONDS
""",
    doc="As-of join (SURVEY.md 2.6): latest same-symbol click price at or "
    "before each purchase, 1-hour tolerance. Spark side: bucketed range "
    "join (operators/asof.py) — equi-join on time buckets, no O(n^2) "
    "theta-join; DuckDB side: native ASOF JOIN.",
    tags=("arbitrage", "asof-join"),
)
def asof_last_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    purchases = t.filter(F.col("taker_side") == "purchase")
    clicks = t.filter(F.col("taker_side") == "click")
    joined = asof_join(
        purchases,
        clicks,
        on=["symbol"],
        tolerance_seconds=3600,
        left_id="trade_id",
        right_cols=["price"],
        right_tiebreak="trade_id",
    )
    return joined.select(
        "trade_id",
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "price",
        "price_right",
        F.unix_micros(F.col("trade_timestamp_right")).alias("click_ts_us"),
    )


@register(
    "tick_dedup_first_per_minute",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT venue, symbol,
       {sql_fmt_ts("date_trunc('minute', trade_timestamp)")} AS minute,
       trade_id, price, epoch_us(trade_timestamp) AS ts_us
FROM ticks
QUALIFY row_number() OVER (
  PARTITION BY venue, symbol, date_trunc('minute', trade_timestamp)
  ORDER BY trade_timestamp, trade_id) = 1
""",
    doc="Deterministic dedup (SURVEY.md T8, README-claimed): keep the "
    "earliest tick per (venue, symbol, minute) by (event time, trade_id) "
    "— rank-1 window, never arrival-order dropDuplicates.",
    tags=("dedup", "window-function"),
)
def tick_dedup_first_per_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir).withColumn(
        "minute", F.date_trunc("minute", F.col("trade_timestamp"))
    )
    d = dedup_exact(
        t, ["venue", "symbol", "minute"], [F.col("trade_timestamp"), F.col("trade_id")]
    )
    return d.select(
        "venue",
        "symbol",
        fmt_ts("minute", "minute"),
        "trade_id",
        "price",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
    )


@register(
    "venue_union_stats",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
u AS (
  SELECT venue, symbol, price FROM ticks WHERE venue = 'coinbase'
  UNION ALL
  SELECT venue, symbol, price FROM ticks WHERE venue = 'binance'
)
SELECT venue, symbol, count(*) AS n, {sql_davg("price")} AS avg_price
FROM u GROUP BY venue, symbol
""",
    doc="Venue stream union via unionByName (SURVEY.md 2.6 planned op) "
    "with per-venue stats.",
    tags=("arbitrage", "set-op"),
)
def venue_union_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    a = t.filter(F.col("venue") == "coinbase").select("venue", "symbol", "price")
    # different column order on purpose: unionByName aligns by name
    b = t.filter(F.col("venue") == "binance").select("price", "symbol", "venue")
    u = a.unionByName(b)
    return u.groupBy("venue", "symbol").agg(
        F.count(F.lit(1)).alias("n"), davg("price").alias("avg_price")
    )


@register(
    "vwap_pivot_by_venue",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT symbol,
  {sql_dsum("CASE WHEN venue = 'coinbase' THEN price * size END")}
    / {sql_dsum("CASE WHEN venue = 'coinbase' THEN size END")} AS coinbase,
  {sql_dsum("CASE WHEN venue = 'binance' THEN price * size END")}
    / {sql_dsum("CASE WHEN venue = 'binance' THEN size END")} AS binance
FROM ticks GROUP BY symbol
""",
    doc="Pivot: per-symbol VWAP by venue as columns (SURVEY.md 2.5 family; "
    "oracle twin is conditional aggregation).",
    tags=("arbitrage", "pivot"),
)
def vwap_pivot_by_venue(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    pv = F.col("price") * F.col("size")
    vwap = F.sum(pv.cast("decimal(25,10)")).cast("double") / F.sum(
        F.col("size").cast("decimal(25,10)")
    ).cast("double")
    return t.groupBy("symbol").pivot("venue", ["coinbase", "binance"]).agg(vwap)


@register(
    "arb_triangular_cycle_1h",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
closes AS (
  SELECT venue, symbol, date_trunc('hour', trade_timestamp) AS w,
         arg_max(price, epoch_us(trade_timestamp)::HUGEINT * 1000000000000
                 + trade_id) AS close
  FROM ticks GROUP BY 1, 2, 3
),
piv AS (
  SELECT venue, w,
         max(CASE WHEN symbol = 'S0' THEN close END) AS c0,
         max(CASE WHEN symbol = 'S1' THEN close END) AS c1,
         max(CASE WHEN symbol = 'S2' THEN close END) AS c2
  FROM closes GROUP BY 1, 2
),
dev AS (
  SELECT venue, w, c0, c1, c2, c0 * c1 / c2 AS cycle_dev
  FROM piv
  WHERE c0 IS NOT NULL AND c1 IS NOT NULL AND c2 IS NOT NULL
),
med AS (
  SELECT venue, quantile_disc(cycle_dev, 0.5) AS med FROM dev GROUP BY 1
)
SELECT d.venue, {sql_fmt_ts("d.w")} AS window_start,
       d.c0, d.c1, d.c2, d.cycle_dev
FROM dev d JOIN med m ON d.venue = m.venue
WHERE d.cycle_dev > 2 * m.med OR d.cycle_dev * 2 < m.med
""",
    doc="TRIANGULAR arbitrage signal — the cycle check the title "
    "capability implies but the reference never computes: treating "
    "S0/S1/S2 as the three legs of a currency triangle (A/B x B/C vs "
    "A/C), each (venue, hour)'s cycle deviation is c0*c1/c2 over the "
    "deterministic per-leg closes, and a minute signals when its "
    "deviation leaves [med/2, 2*med] of the venue's own DISCRETE median "
    "— self-calibrating, no fixed band to tune (hourly legs: the "
    "sparser synthetic tape rarely fills all three legs inside one "
    "minute; real BTC/ETH tapes would run this at 1m). Float discipline: "
    "closes are exact arg_max selections, the deviation is exactly two "
    "correctly-rounded IEEE ops in the same association both engines "
    "parse (c0*c1 then /c2), and the median is a discrete element "
    "selection — every comparison therefore bit-reproducible against "
    "DuckDB. Plan shape at 100 TB: ONE tick shuffle into (venue, "
    "symbol, hour) candles with map-side partials, a second "
    "candle-sized pivot aggregate, and the per-venue medians broadcast "
    "back — no tick moves twice, no window function over a 2-key "
    "partition anywhere.",
    tags=("arbitrage", "aggregate", "pivot", "median"),
)
def arb_triangular_cycle_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    closes = t.groupBy(
        "venue",
        "symbol",
        F.date_trunc("hour", F.col("trade_timestamp")).alias("w"),
    ).agg(
        F.max_by(
            "price", F.struct(F.col("trade_timestamp"), F.col("trade_id"))
        ).alias("close")
    )
    piv = closes.groupBy("venue", "w").agg(
        *[
            F.max(
                F.when(F.col("symbol") == f"S{i}", F.col("close"))
            ).alias(f"c{i}")
            for i in range(3)
        ]
    )
    # shared(): dev feeds BOTH the median branch and the output join —
    # without it each branch re-aggregates the full tick table (Catalyst
    # does not reuse subtrees across branches); dev is candle-sized, the
    # per-row-reduction shape the shared() contract wants
    dev = shared(
        piv.filter(
            F.col("c0").isNotNull()
            & F.col("c1").isNotNull()
            & F.col("c2").isNotNull()
        ).withColumn("cycle_dev", F.col("c0") * F.col("c1") / F.col("c2"))
    )
    med = dev.groupBy("venue").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY cycle_dev)"
        ).alias("med")
    )
    return (
        dev.join(F.broadcast(med), "venue")
        .filter(
            (F.col("cycle_dev") > 2 * F.col("med"))
            | (F.col("cycle_dev") * 2 < F.col("med"))
        )
        .select(
            "venue",
            fmt_ts("w", "window_start"),
            "c0",
            "c1",
            "c2",
            "cycle_dev",
        )
    )
