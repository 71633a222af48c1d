"""Canonical mapping from the driver's ``events`` table onto tick semantics.

FIXTURES.md section 4 assigns the roles: ``props`` plays the JSON payload,
``ts`` the event time, ``event_id`` the trade id, ``user_id`` the symbol
bucket, ``event_type`` the message-type / venue salt, ``value`` the price.
Every oracle-checked query over ticks goes through this single mapping so
the Spark side and the DuckDB oracle SQL (``EVENTS_TICKS_CTE``) stay in
lockstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..schemas import EVENT_PROPS_SCHEMA

#: event types that play "ticker"/"ticker_batch" messages; ``error`` plays
#: the non-ticker control messages the silver gate drops (SURVEY.md P5).
TICK_EVENT_TYPES = ("click", "view", "purchase", "signup")


def events_as_ticks(events: DataFrame) -> DataFrame:
    """events -> silver-shaped ticks (venue, symbol, price, size, ...).

    Mirrors `parse_bronze_ticks` stage-for-stage: JSON parse of ``props``,
    message-type + not-null gate, typed projection. Stateless/narrow.
    """
    parsed = events.withColumn("parsed", F.from_json(F.col("props"), EVENT_PROPS_SCHEMA))
    gated = parsed.filter(
        F.col("event_type").isin(*TICK_EVENT_TYPES) & F.col("parsed.k").isNotNull()
    )
    return gated.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("coinbase"))
        .otherwise(F.lit("binance"))
        .alias("venue"),
        F.concat(F.lit("S"), (F.col("user_id") % 3).cast("string")).alias("symbol"),
        F.col("value").alias("price"),
        (F.col("parsed.k") + 1).cast("double").alias("size"),
        F.col("event_id").alias("trade_id"),
        F.col("ts").alias("trade_timestamp"),
        F.col("event_type").alias("taker_side"),
    )


#: DuckDB twin of `events_as_ticks` — keep in lockstep with the Spark code.
EVENTS_TICKS_CTE = """
ticks AS (
  SELECT
    CASE WHEN event_id % 2 = 0 THEN 'coinbase' ELSE 'binance' END AS venue,
    'S' || CAST(user_id % 3 AS VARCHAR) AS symbol,
    value AS price,
    CAST(CAST(json_extract(props, '$.k') AS INTEGER) + 1 AS DOUBLE) AS size,
    event_id AS trade_id,
    ts AS trade_timestamp,
    event_type AS taker_side
  FROM events
  WHERE event_type IN ('click', 'view', 'purchase', 'signup')
    AND json_extract(props, '$.k') IS NOT NULL
)
"""
