"""Medallion-pipeline queries: silver parse, gold candles, candle analytics.

These are the reference's own query surface (SURVEY.md sections 2.3-2.5,
2.7-2.8) run in batch over the driver's ``events`` table via the canonical
tick mapping (`operators.ticks`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.determinism import fmt_ts, sql_dsum, sql_fmt_ts
from ..operators.alerts import new_high_alerts
from ..operators.chunked_lag import chunked_lag
from ..operators.gold import candles
from ..operators.running_vwap import running_vwap
from ..operators.ticks import EVENTS_TICKS_CTE, events_as_ticks
from ..sources.testdata import load_table
from .registry import register


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_ticks(load_table(spark, sf_dir, "events"))


def _gold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared silver->gold slice; oracle-safe projection (string window,
    exact-decimal-backed doubles for vwap/avg)."""
    gold = candles(_ticks(spark, sf_dir))
    return gold.select(
        fmt_ts("window_start", "window_start"),
        fmt_ts("window_end", "window_end"),
        "symbol",
        "open",
        "high",
        "low",
        "close",
        "trade_count",
        "vwap",
        "avg_price",
    )


#: DuckDB twin of the gold candle aggregation (kept in lockstep with
#: `operators.gold.candles` + the projection above).
_GOLD_ORACLE_BODY = f"""
SELECT
  {sql_fmt_ts("date_trunc('minute', trade_timestamp)")} AS window_start,
  {sql_fmt_ts("date_trunc('minute', trade_timestamp) + INTERVAL 1 MINUTE")} AS window_end,
  symbol,
  arg_min(price, epoch_us(trade_timestamp)::HUGEINT * 1000000000000 + trade_id) AS open,
  max(price) AS high,
  min(price) AS low,
  arg_max(price, epoch_us(trade_timestamp)::HUGEINT * 1000000000000 + trade_id) AS close,
  count(*) AS trade_count,
  {sql_dsum("price * size")} / {sql_dsum("size")} AS vwap,
  {sql_dsum("price")} / CAST(COUNT(*) AS DOUBLE) AS avg_price
FROM ticks
GROUP BY 1, 2, 3
"""


@register(
    "silver_typed_ticks",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT venue, symbol, price, size, trade_id,
       epoch_us(trade_timestamp) AS trade_ts_us, taker_side
FROM ticks
""",
    doc="Bronze->silver parse: from_json + type gate + typed projection "
    "(SURVEY.md P2/P3/P5/F1-F3; process_silver.py:87-124).",
    tags=("silver", "parse"),
)
def silver_typed_ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    return t.select(
        "venue",
        "symbol",
        "price",
        "size",
        "trade_id",
        F.unix_micros(F.col("trade_timestamp")).alias("trade_ts_us"),
        "taker_side",
    )


@register(
    "gold_candles_1m",
    oracle=f"WITH {EVENTS_TICKS_CTE}\n{_GOLD_ORACLE_BODY}",
    doc="Flagship: 1-minute OHLC+VWAP candles, deterministic open/close "
    "(SURVEY.md A1-A7/T2; gold_layer.py:55-80 with bugs fixed).",
    tags=("gold", "aggregate", "flagship"),
)
def gold_candles_1m(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _gold(spark, sf_dir)


@register(
    "gold_latest_candles",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
gold AS ({_GOLD_ORACLE_BODY})
SELECT * FROM gold
ORDER BY window_start DESC, symbol DESC
LIMIT 20
""",
    doc="check_gold.py:15-16 equivalent: global sort desc + top-20 "
    "(SURVEY.md O1; Spark plans this as TakeOrderedAndProject - no full sort).",
    tags=("gold", "sort", "limit"),
)
def gold_latest_candles(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = _gold(spark, sf_dir)
    return gold.orderBy(F.desc("window_start"), F.desc("symbol")).limit(20)


@register(
    "candle_close_delta",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
gold AS ({_GOLD_ORACLE_BODY})
SELECT window_start, symbol, close,
       close - lag(close) OVER (PARTITION BY symbol ORDER BY window_start) AS close_delta
FROM gold
""",
    doc="Dashboard KPI delta engine-side: lag(close) per symbol "
    "(SURVEY.md O5; dashboard/app.py:70-77 done client-side in pandas). "
    "Computed with the chunked-lag rewrite (operators/chunked_lag.py): a "
    "plain per-symbol window would serialize each symbol's history into "
    "one task (3 symbols -> parallelism 3 at any cluster size); chunking "
    "by day keeps the heavy stage parallel and runs the serial pass over "
    "the per-(symbol, day) tail summary only.",
    tags=("gold", "window-function"),
)
def candle_close_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    # narrow to the three needed columns BEFORE the two-branch lag so both
    # branches share one canonical subtree (maximizes exchange reuse)
    gold = _gold(spark, sf_dir).select("window_start", "symbol", "close")
    # window_start is 'yyyy-MM-dd HH:mm:ss': lexicographic == chronological,
    # and the date prefix is a monotone chunk of it.
    lagged = chunked_lag(
        gold,
        key_cols=["symbol"],
        order_col="window_start",
        value_col="close",
        chunk=F.substring("window_start", 1, 10),
        out_col="prev_close",
        materialize=True,
    )
    return lagged.select(
        "window_start",
        "symbol",
        "close",
        (F.col("close") - F.col("prev_close")).alias("close_delta"),
    )


@register(
    "events_freshness",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT venue, count(*) AS n_ticks, epoch_us(max(trade_timestamp)) AS max_ts_us,
       epoch_us(min(trade_timestamp)) AS min_ts_us
FROM ticks GROUP BY venue
""",
    doc="check_data.py:24-35 equivalent: per-venue volume + freshness "
    "(SURVEY.md A8/O2 as an aggregation instead of sort+show).",
    tags=("inspection", "aggregate"),
)
def events_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    return t.groupBy("venue").agg(
        F.count(F.lit(1)).alias("n_ticks"),
        F.unix_micros(F.max("trade_timestamp")).alias("max_ts_us"),
        F.unix_micros(F.min("trade_timestamp")).alias("min_ts_us"),
    )


@register(
    "distinct_symbols",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT DISTINCT symbol FROM ticks
""",
    doc="Dashboard panel driver: distinct symbols (SURVEY.md A9).",
    tags=("inspection",),
)
def distinct_symbols(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ticks(spark, sf_dir).select("symbol").distinct()


@register(
    "candle_ohlc_unpivot",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
gold AS ({_GOLD_ORACLE_BODY})
SELECT window_start, symbol, field, price FROM (
  SELECT window_start, symbol, 'open' AS field, open AS price FROM gold
  UNION ALL SELECT window_start, symbol, 'high', high FROM gold
  UNION ALL SELECT window_start, symbol, 'low', low FROM gold
  UNION ALL SELECT window_start, symbol, 'close', close FROM gold
) u
""",
    doc="Unpivot (wide->long melt) of the candle OHLC columns into "
    "(field, price) rows — the inverse of vwap_pivot_by_venue's pivot. "
    "Spark's unpivot is a row-local generate (4 output rows per input "
    "row, no shuffle beyond the candle aggregation itself); long form is "
    "what plotting/export pipelines consume.",
    tags=("gold", "unpivot"),
)
def candle_ohlc_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    gold = _gold(spark, sf_dir)
    return gold.unpivot(
        ["window_start", "symbol"],
        ["open", "high", "low", "close"],
        "field",
        "price",
    )


@register(
    "tick_new_high_alerts",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
w AS (
  SELECT symbol, epoch_us(trade_timestamp) AS ts_us, trade_id,
         CAST(price AS DOUBLE) AS price,
         max(CAST(price AS DOUBLE)) OVER (
           PARTITION BY symbol ORDER BY trade_timestamp, trade_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_high
  FROM ticks
)
SELECT symbol, ts_us, trade_id, price, prev_high
FROM w WHERE prev_high IS NOT NULL AND price > prev_high
""",
    doc="Custom stateful alert operator, batch form: every tick whose "
    "price strictly exceeds its symbol's running high, with the beaten "
    "high. Runs the same Arrow-vectorized NumPy kernel as the streaming "
    "applyInPandasWithState form (operators/alerts.py) — the oracle pins "
    "the kernel's semantics via the running-max window twin, and the "
    "streaming suite proves the state (one double per key) carries "
    "across micro-batches.",
    tags=("alerts", "stateful", "pandas"),
)
def tick_new_high_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return new_high_alerts(_ticks(spark, sf_dir))


@register(
    "tick_running_vwap",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT symbol, epoch_us(trade_timestamp) AS ts_us, trade_id, price, size,
       CAST(CAST(SUM(CAST(price * size AS DECIMAL(25,10))) OVER w AS VARCHAR) AS DOUBLE)
       / CAST(CAST(SUM(CAST(size AS DECIMAL(25,10))) OVER w AS VARCHAR) AS DOUBLE)
         AS vwap
FROM ticks
WINDOW w AS (PARTITION BY symbol ORDER BY trade_timestamp, trade_id
             ROWS UNBOUNDED PRECEDING)
""",
    doc="Anchored VWAP at every tick: sum(price*size)/sum(size) over each "
    "symbol's full history up to that tick — the real version of the KPI "
    "the reference's dashboard approximates client-side. The Spark plan "
    "is the two-level chunked rewrite (operators/running_vwap.py): "
    "exact-decimal running sums per (symbol, day-chunk) in parallel, a "
    "prefix pass over per-chunk totals only, broadcast offsets back — "
    "so the per-key sequential stage never sees more than a chunk. The "
    "oracle is the plain single-window form; decimal associativity makes "
    "them bit-identical. The streaming twin carries (sum_pv, sum_v) in "
    "Spark 4 transformWithStateInPandas ValueState (streaming suite).",
    tags=("window-function", "stateful", "gold"),
)
def tick_running_vwap(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = running_vwap(_ticks(spark, sf_dir))
    return out.select(
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
        "price",
        "size",
        "vwap",
    )
