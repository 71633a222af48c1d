"""Declared schemas for every medallion layer.

The reference declares the silver parse schema inline
(``src/jobs/process_silver.py:30-43``) and lets Delta record the rest; here
every layer has an explicit ``StructType`` (SURVEY.md section 1.5). Money is
``DecimalType(18, 8)`` (reference rationale: financial precision,
``README.md:127`` / ``process_silver.py:110``); event time is
``TimestampType``; numerics on the wire are read **as strings first** to
avoid double-precision loss during JSON parsing (the reference does the
same, ``process_silver.py:33-34``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Wire / bronze layer
# ---------------------------------------------------------------------------

#: Full exchange ticker payload (reference parses only 7 of these fields,
#: ``src/jobs/process_silver.py:30-43``; the rest — notably ``last_size``,
#: ``best_bid``/``best_ask`` — are required for true VWAP and arbitrage
#: spreads, SURVEY.md section 1.2, and are kept here).
TICKER_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("type", T.StringType()),
        T.StructField("sequence", T.LongType()),
        T.StructField("product_id", T.StringType()),
        T.StructField("price", T.StringType()),
        T.StructField("open_24h", T.StringType()),
        T.StructField("volume_24h", T.StringType()),
        T.StructField("low_24h", T.StringType()),
        T.StructField("high_24h", T.StringType()),
        T.StructField("volume_30d", T.StringType()),
        T.StructField("best_bid", T.StringType()),
        T.StructField("best_bid_size", T.StringType()),
        T.StructField("best_ask", T.StringType()),
        T.StructField("best_ask_size", T.StringType()),
        T.StructField("side", T.StringType()),
        T.StructField("time", T.StringType()),
        T.StructField("trade_id", T.LongType()),
        T.StructField("last_size", T.StringType()),
        T.StructField("ingest_ts", T.DoubleType()),
    ]
)

#: Kafka record shape as the broker delivers it (binary key/value +
#: broker timestamp) — what `streaming.sources.rate_replay_ticks` emits
#: and `streaming.jobs.bronze_ingest` consumes (SURVEY.md S1/F4).
KAFKA_SHAPED_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType()),
        T.StructField("value", T.BinaryType()),
        T.StructField("timestamp", T.TimestampType()),
    ]
)

#: Bronze envelope — raw schema-on-read rows, exactly the reference's
#: committed bronze Delta schema (SURVEY.md section 1.1).
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("json_payload", T.StringType()),
        T.StructField("kafka_ts", T.TimestampType()),
        T.StructField("ingest_ts", T.TimestampType()),
    ]
)

# ---------------------------------------------------------------------------
# Silver layer
# ---------------------------------------------------------------------------

PRICE_DECIMAL = T.DecimalType(18, 8)

#: Typed ticks. Superset of the reference's committed silver schema
#: (adds venue/size/trade_id needed for arbitrage, true VWAP, and dedup —
#: FIXTURES.md section 2).
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("venue", T.StringType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("price", PRICE_DECIMAL),
        T.StructField("size", PRICE_DECIMAL),
        T.StructField("trade_id", T.LongType()),
        T.StructField("trade_timestamp", T.TimestampType()),
        T.StructField("taker_side", T.StringType()),
    ]
)

# ---------------------------------------------------------------------------
# Gold layer
# ---------------------------------------------------------------------------

#: 1-minute OHLC candles (reference gold schema, SURVEY.md section 1.1,
#: with deterministic open/close and true VWAP — SURVEY.md section 7.5).
GOLD_SCHEMA = T.StructType(
    [
        T.StructField("window_start", T.TimestampType()),
        T.StructField("window_end", T.TimestampType()),
        T.StructField("symbol", T.StringType()),
        T.StructField("open", PRICE_DECIMAL),
        T.StructField("high", PRICE_DECIMAL),
        T.StructField("low", PRICE_DECIMAL),
        T.StructField("close", PRICE_DECIMAL),
        T.StructField("trade_count", T.LongType()),
        T.StructField("vwap", T.DecimalType(22, 12)),
    ]
)

# ---------------------------------------------------------------------------
# Driver testdata (read-only parquet; TESTDATA.md)
# ---------------------------------------------------------------------------

#: ``events.props`` JSON payload shape (observed: ``{"k": <int>}``).
EVENT_PROPS_SCHEMA = T.StructType([T.StructField("k", T.IntegerType())])

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
