"""Oracle-checked streaming queries.

The driver's correctness harness is batch SQL, so streaming coverage
normally stops at pytest. This module closes the gap for the one streaming
property that IS SQL-expressible: a ``trigger(availableNow=True)`` drain of
the windowed gold aggregation equals the batch aggregation restricted to
watermark-finalized windows (``window_end <= max event time - watermark``).
The query below physically runs ``readStream -> withWatermark -> window agg
-> writeStream(append, checkpoint)`` and the DuckDB twin computes the same
finalization predicate — so T1/T2/T3/T4/T5/T6 and K1-K3 all sit behind a
green CORRECTNESS row instead of only a pytest.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..functions.determinism import fmt_ts, sql_dsum, sql_fmt_ts
from ..operators.ticks import EVENTS_TICKS_CTE, events_as_ticks
from ..sources.testdata import load_table
from ..streaming.jobs import gold_stream
from ..streaming.sinks import drain, scoped_shuffle_partitions, start_parquet_stream
from ..streaming.sources import read_parquet_stream
from .registry import register

WATERMARK = "10 minutes"

#: raw-timestamp gold aggregation + the append-mode finalization predicate
#: (window closes when the final watermark = max event time - 10 min passes
#: its end). Column tiebreak mirrors plans/medallion._GOLD_ORACLE_BODY.
_STREAM_GOLD_SQL = f"""
gold AS (
  SELECT
    date_trunc('minute', trade_timestamp) AS ws,
    date_trunc('minute', trade_timestamp) + INTERVAL 1 MINUTE AS we,
    symbol,
    arg_min(price, epoch_us(trade_timestamp)::HUGEINT * 1000000000000 + trade_id) AS open,
    max(price) AS high,
    min(price) AS low,
    arg_max(price, epoch_us(trade_timestamp)::HUGEINT * 1000000000000 + trade_id) AS close,
    count(*) AS trade_count,
    {sql_dsum("price * size")} / {sql_dsum("size")} AS vwap
  FROM ticks
  GROUP BY 1, 2, 3
),
wm AS (SELECT max(trade_timestamp) - INTERVAL 10 MINUTE AS horizon FROM ticks)
"""


@register(
    "streaming_gold_candles_availablenow",
    oracle=f"""
WITH {EVENTS_TICKS_CTE},
{_STREAM_GOLD_SQL}
SELECT {sql_fmt_ts("g.ws")} AS window_start,
       {sql_fmt_ts("g.we")} AS window_end,
       g.symbol, g.open, g.high, g.low, g.close, g.trade_count, g.vwap
FROM gold g, wm
WHERE g.we <= wm.horizon
""",
    doc="Structured Streaming gold job, physically executed: parquet file "
    "stream -> 10-min watermark -> 1-min windowed OHLC/VWAP -> append-mode "
    "checkpointed parquet sink, drained with trigger(availableNow=True). "
    "Oracle = batch aggregation restricted to watermark-finalized windows "
    "(stream==batch equivalence, SURVEY.md section 5.2.3 / T1-T6, K1-K3).",
    tags=("streaming", "gold", "watermark"),
)
def streaming_gold_candles_availablenow(spark: SparkSession, sf_dir: str) -> DataFrame:
    ticks = events_as_ticks(load_table(spark, sf_dir, "events"))
    # Materialize the tick stream source, then drain it through the real
    # streaming job. Fresh temp dirs per call: checkpoints are stateful.
    root = tempfile.mkdtemp(prefix="cpstream_")
    src = os.path.join(root, "src")
    gold_path = os.path.join(root, "gold")
    ckpt = os.path.join(root, "ckpt")
    ticks.write.parquet(src)
    stream = read_parquet_stream(spark, src, ticks.schema)
    with scoped_shuffle_partitions(spark):
        drain(
            start_parquet_stream(
                gold_stream(stream, watermark=WATERMARK),
                path=gold_path,
                checkpoint=ckpt,
                query_name="gold_candles_availablenow",
            )
        )
    out = spark.read.parquet(gold_path)
    return out.select(
        fmt_ts("window_start", "window_start"),
        fmt_ts("window_end", "window_end"),
        "symbol",
        "open",
        "high",
        "low",
        "close",
        "trade_count",
        "vwap",
    )


@register(
    "streaming_click_purchase_interval_join",
    oracle="""
WITH c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
)
SELECT p.user_id % 10 AS user_bucket,
       count(*) AS n_matches,
       count(DISTINCT p.event_id) AS n_purchases,
       count(DISTINCT c.event_id) AS n_clicks
FROM p JOIN c
  ON c.user_id = p.user_id
 AND c.ts >= p.ts - INTERVAL 30 MINUTE
 AND c.ts <= p.ts
GROUP BY 1
""",
    doc="STREAM-STREAM interval join, physically executed (T7 made "
    "driver-checkable): click and purchase streams over the same event "
    "source, both watermarked 10 minutes, inner-joined on user with a "
    "30-minute attribution window, drained append-mode through a "
    "checkpointed parquet sink with trigger(availableNow=True), then "
    "audited per user bucket. Inner-join matches emit as found; the "
    "dual watermark (Spark takes the MIN across inputs) bounds the "
    "buffered state to the interval span — the mechanism that makes "
    "stream-stream joins feasible at 100 TB/day, where unbounded state "
    "would OOM. The source is a single file so the bounded drain is one "
    "micro-batch and emission is deterministic; the oracle is the plain "
    "batch interval join — stream == batch, the Structured Streaming "
    "contract.",
    tags=("streaming", "join", "interval", "watermark"),
)
def streaming_click_purchase_interval_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    root = tempfile.mkdtemp(prefix="cpssjoin_")
    src = os.path.join(root, "src")
    out_path = os.path.join(root, "joined")
    ckpt = os.path.join(root, "ckpt")
    # one file -> one micro-batch: deterministic emission (state eviction
    # across micro-batches would otherwise depend on file order)
    events.coalesce(1).write.parquet(src)

    stream = read_parquet_stream(spark, src, events.schema)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("click_user"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("purchase_user"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    joined = purchases.join(
        clicks,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "inner",
    ).select("purchase_user", "purchase_id", "click_id")
    # stream-stream join state cost is (shuffle partitions × micro-batch)
    # store commits — drain at the reference's narrow streaming width
    with scoped_shuffle_partitions(spark):
        drain(
            start_parquet_stream(
                joined,
                path=out_path,
                checkpoint=ckpt,
                query_name="click_purchase_interval_join",
            )
        )
    # explicit schema: a zero-match drain commits no data files and
    # schema inference would fail where the correct answer is empty
    matches = spark.read.schema(joined.schema).parquet(out_path)
    return matches.groupBy((F.col("purchase_user") % 10).alias("user_bucket")).agg(
        F.count(F.lit(1)).alias("n_matches"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        F.countDistinct("click_id").alias("n_clicks"),
    )


@register(
    "streaming_purchase_attribution_left_join",
    oracle="""
WITH c AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'click'
),
p AS (
  SELECT event_id, ts, user_id FROM events WHERE event_type = 'purchase'
),
wm AS (
  SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
         - INTERVAL 10 MINUTE AS horizon
),
matched AS (
  SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.ts >= p.ts - INTERVAL 30 MINUTE
   AND c.ts <= p.ts
),
unmatched AS (
  SELECT p.user_id, p.event_id AS purchase_id, NULL AS click_id
  FROM p, wm
  WHERE p.ts < wm.horizon
    AND NOT EXISTS (
      SELECT 1 FROM c
      WHERE c.user_id = p.user_id
        AND c.ts >= p.ts - INTERVAL 30 MINUTE
        AND c.ts <= p.ts
    )
),
emitted AS (
  SELECT * FROM matched UNION ALL SELECT * FROM unmatched
)
SELECT user_id % 10 AS user_bucket,
       count(*) AS n_rows,
       count(click_id) AS n_matched,
       count(*) - count(click_id) AS n_unattributed,
       count(DISTINCT purchase_id) AS n_purchases
FROM emitted
GROUP BY 1
""",
    doc="STREAM-STREAM LEFT OUTER join, physically executed: purchases "
    "left-joined to clicks on user within a 30-minute attribution "
    "window, both sides watermarked 10 minutes, drained append-mode "
    "with trigger(availableNow=True). The outer semantics are the "
    "streaming-specific part: a match emits immediately, but a "
    "PURCHASE WITH NO CLICK can only emit null-extended once the "
    "watermark proves no matching click can still arrive (watermark > "
    "purchase ts, since clicks up to the purchase instant could match) "
    "— purchases younger than the final watermark stay in state and "
    "never emit, which the oracle's horizon predicate reproduces "
    "exactly (min of both inputs' max event time - 10 min, Spark's "
    "multi-watermark MIN policy). State is bounded by the interval "
    "span on both sides — the property that keeps outer attribution "
    "feasible at 100 TB/day where an unwatermarked outer join would "
    "buffer the full history. Oracle = batch left join + horizon "
    "filter on the null side: stream == batch on finalized results, "
    "the Structured Streaming contract.",
    tags=("streaming", "join", "outer", "watermark", "interval"),
)
def streaming_purchase_attribution_left_join(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    root = tempfile.mkdtemp(prefix="cplojoin_")
    src = os.path.join(root, "src")
    out_path = os.path.join(root, "joined")
    ckpt = os.path.join(root, "ckpt")
    events.coalesce(1).write.parquet(src)

    stream = read_parquet_stream(spark, src, events.schema)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            F.col("user_id").alias("click_user"),
        )
        .withWatermark("click_ts", WATERMARK)
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("purchase_user"),
        )
        .withWatermark("purchase_ts", WATERMARK)
    )
    joined = purchases.join(
        clicks,
        (F.col("click_user") == F.col("purchase_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("click_ts") <= F.col("purchase_ts")),
        "left_outer",
    ).select("purchase_user", "purchase_id", "click_id")
    with scoped_shuffle_partitions(spark):
        drain(
            start_parquet_stream(
                joined,
                path=out_path,
                checkpoint=ckpt,
                query_name="purchase_attribution_left_join",
            )
        )
    emitted = spark.read.schema(joined.schema).parquet(out_path)
    return emitted.groupBy(
        (F.col("purchase_user") % 10).alias("user_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("click_id").alias("n_matched"),
        (F.count(F.lit(1)) - F.count("click_id")).alias("n_unattributed"),
        F.countDistinct("purchase_id").alias("n_purchases"),
    )
