"""Silver -> Gold: event-time windowed OHLC / VWAP candle aggregation.

Re-expresses the reference's gold job (``src/jobs/gold_layer.py:47-92``,
SURVEY.md A1-A7/T1/T2/T4) with its two correctness bugs fixed:

- open/close use ``min_by``/``max_by`` on (event time, trade_id) instead of
  the arrival-order-dependent ``first``/``last`` (``gold_layer.py:62,65`` —
  SURVEY.md A2/A5: non-deterministic under shuffle).
- ``vwap`` is the true volume-weighted price ``sum(price*size)/sum(size)``;
  the reference ships ``avg(price)`` and admits it in a comment
  (``gold_layer.py:67``). The unweighted mean is kept as ``avg_price``
  for behavioral parity.

Batch/stream agnostic: pass ``watermark=`` to run the identical transform
under Structured Streaming with append-mode finalization (reference T1/T4:
10-minute watermark gates emission and bounds state).

Scale notes: this is ONE shuffle, hash-partitioned on
(window, symbol). Partial aggregation (map-side combine) happens before the
exchange, so the shuffle carries one row per (input-partition, window,
symbol) — at 100 TB with a 1-minute window and a few thousand symbols the
reduce side stays tiny. Skewed symbols (one hot product) are handled by AQE
skew-join/partition splitting; state in streaming mode is bounded by the
watermark horizon x distinct (window, symbol).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.determinism import SUM_DECIMAL


def candles(
    ticks: DataFrame,
    *,
    window: str = "1 minute",
    slide: str | None = None,
    ts_col: str = "trade_timestamp",
    symbol_col: str = "symbol",
    price_col: str = "price",
    size_col: str = "size",
    tiebreak_col: str = "trade_id",
    extra_keys: tuple[str, ...] = (),
    watermark: str | None = None,
) -> DataFrame:
    """Windowed OHLC+VWAP candles, deterministic and stream-ready.

    Tumbling by default; pass ``slide`` (< ``window``) for overlapping
    sliding windows — same primitive family (SURVEY.md T2), each tick then
    contributes to ``window/slide`` buckets.
    """
    if watermark is not None:
        ticks = ticks.withWatermark(ts_col, watermark)
    # Deterministic ordering key for open/close: event time, then trade id
    # (struct comparison is lexicographic — SURVEY.md section 7.4 tie-break).
    order = F.struct(F.col(ts_col), F.col(tiebreak_col))
    win = (
        F.window(F.col(ts_col), window)
        if slide is None
        else F.window(F.col(ts_col), window, slide)
    )
    keys = [win.alias("w"), F.col(symbol_col)]
    keys += [F.col(k) for k in extra_keys]
    price = F.col(price_col)
    size = F.col(size_col)
    # Sums go through a per-row decimal cast so they are EXACT and
    # order-independent (see functions.determinism): with double inputs a
    # naive sum would vary with shuffle order; with decimal(18,8) inputs
    # the cast is lossless. min/max/min_by on doubles are already exact.
    agg = ticks.groupBy(*keys).agg(
        F.min_by(price, order).alias("open"),
        F.max(price).alias("high"),
        F.min(price).alias("low"),
        F.max_by(price, order).alias("close"),
        F.count(F.lit(1)).alias("trade_count"),
        F.sum((price * size).cast(SUM_DECIMAL)).alias("sum_pv"),
        F.sum(size.cast(SUM_DECIMAL)).alias("sum_volume"),
        F.sum(price.cast(SUM_DECIMAL)).alias("_sum_price"),
    )
    return agg.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        symbol_col,
        *extra_keys,
        "open",
        "high",
        "low",
        "close",
        "trade_count",
        "sum_pv",
        "sum_volume",
        (F.col("sum_pv").cast("double") / F.col("sum_volume").cast("double")).alias(
            "vwap"
        ),
        (F.col("_sum_price").cast("double") / F.col("trade_count").cast("double")).alias(
            "avg_price"
        ),
    )
