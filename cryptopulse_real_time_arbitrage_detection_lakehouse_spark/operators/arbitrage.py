"""Cross-venue arbitrage spread detection.

The reference's *title* capability ("Real-Time Arbitrage Detection",
``README.md:2``) — and the single biggest claim its code never implements:
no join, pivot, or cross-venue comparison exists anywhere in its ``src/``
(SURVEY.md section 2.6). This operator delivers it Spark-first:

1. aggregate each venue's ticks into per-(symbol, window) VWAPs — one
   shuffle with map-side partial aggregation;
2. equi-join the two venue aggregates on (symbol, window_start);
3. spread = a.vwap - b.vwap, relative to the cheaper leg; threshold filter.

Scale notes: both join inputs come pre-aggregated (cardinality = symbols x
windows, tiny vs tick volume), so the join is cheap no matter how large
the tick stream is; with few symbols one side fits in a broadcast. The
expensive part — the tick aggregation — is the same single-shuffle candle
plan as the gold layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .gold import candles


def venue_window_vwap(ticks: DataFrame, *, window: str = "1 minute") -> DataFrame:
    """Per (venue, symbol, window) VWAP table (exact decimal-backed)."""
    c = candles(ticks, window=window, extra_keys=("venue",))
    return c.select("venue", "symbol", "window_start", "vwap", "trade_count")


def arbitrage_spreads(
    ticks: DataFrame,
    *,
    venue_a: str = "coinbase",
    venue_b: str = "binance",
    window: str = "1 minute",
    min_rel_spread: float = 0.0,
) -> DataFrame:
    """Windows where |vwap_a - vwap_b| / min(vwap) exceeds the threshold."""
    vw = venue_window_vwap(ticks, window=window)
    a = vw.filter(F.col("venue") == venue_a).select(
        "symbol",
        "window_start",
        F.col("vwap").alias("vwap_a"),
        F.col("trade_count").alias("trades_a"),
    )
    b = vw.filter(F.col("venue") == venue_b).select(
        "symbol",
        "window_start",
        F.col("vwap").alias("vwap_b"),
        F.col("trade_count").alias("trades_b"),
    )
    joined = a.join(b, ["symbol", "window_start"])
    spread = F.col("vwap_a") - F.col("vwap_b")
    rel = F.abs(spread) / F.least(F.col("vwap_a"), F.col("vwap_b"))
    return joined.select(
        "symbol",
        "window_start",
        "vwap_a",
        "vwap_b",
        "trades_a",
        "trades_b",
        spread.alias("spread"),
        rel.alias("rel_spread"),
    ).filter(F.col("rel_spread") > F.lit(min_rel_spread))
