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


def events_as_quotes(events: DataFrame) -> DataFrame:
    """events -> NBBO-carrying ticks: `events_as_ticks` extended with the
    quote fields the reference's wire record carries and then DROPS
    (``best_bid``/``best_ask``/``best_bid_size``/``best_ask_size``,
    read at ``src/jobs/process_silver.py:33-43`` and never projected —
    SURVEY.md section 1.2 calls them the fields a true arbitrage spread
    needs). The testdata has no quote columns, so the fixture role-play
    derives them DETERMINISTICALLY from ``props.k``:

    - quote midpoint ``mid`` sits up to +-4 bp off the last trade price
      (``(k % 9) - 4`` bp) — decoupling mid from price so effective
      spread, price improvement, and microprice premium are non-trivial;
    - half-spread is 5..25 bp of mid (``(k % 5 + 1) / 2000``), always
      wider than the mid offset, so quotes bracket the trade price in
      the common case but not always (realistic at-or-through prints);
    - depth ``bid_size``/``ask_size`` are small integers from
      independent residues (``k % 7 + 1`` / ``k % 11 + 1``).

    Float discipline: every derived double is ONE fixed chain of
    correctly-rounded IEEE ops written identically in both engines
    (int residue arithmetic is exact; int->double casts exact; *, /,
    +, - each correctly rounded), so per-row values hash bit-for-bit.
    Stateless/narrow: no shuffle, full codegen.
    """
    parsed = events.withColumn("parsed", F.from_json(F.col("props"), EVENT_PROPS_SCHEMA))
    gated = parsed.filter(
        F.col("event_type").isin(*TICK_EVENT_TYPES) & F.col("parsed.k").isNotNull()
    )
    k = F.col("parsed.k")
    price = F.col("value")
    mid = price * (
        F.lit(1.0) + ((k % 9) - F.lit(4)).cast("double") / F.lit(10000.0)
    )
    half = mid * ((k % 5) + F.lit(1)).cast("double") / F.lit(2000.0)
    return gated.select(
        F.when(F.col("event_id") % 2 == 0, F.lit("coinbase"))
        .otherwise(F.lit("binance"))
        .alias("venue"),
        F.concat(F.lit("S"), (F.col("user_id") % 3).cast("string")).alias("symbol"),
        price.alias("price"),
        (k + 1).cast("double").alias("size"),
        F.col("event_id").alias("trade_id"),
        F.col("ts").alias("trade_timestamp"),
        F.col("event_type").alias("taker_side"),
        mid.alias("mid"),
        (mid - half).alias("bid"),
        (mid + half).alias("ask"),
        ((k % 7) + F.lit(1)).cast("long").alias("bid_size"),
        ((k % 11) + F.lit(1)).cast("long").alias("ask_size"),
    )


#: DuckDB twin of `events_as_quotes` — keep in lockstep with the Spark
#: code (same op chain, same association, so doubles match bit-for-bit).
EVENTS_QUOTES_CTE = """
quotes AS (
  SELECT
    CASE WHEN event_id % 2 = 0 THEN 'coinbase' ELSE 'binance' END AS venue,
    'S' || CAST(user_id % 3 AS VARCHAR) AS symbol,
    value AS price,
    CAST(k + 1 AS DOUBLE) AS size,
    event_id AS trade_id,
    ts AS trade_timestamp,
    event_type AS taker_side,
    mid,
    mid - (mid * CAST((k % 5) + 1 AS DOUBLE) / 2000.0) AS bid,
    mid + (mid * CAST((k % 5) + 1 AS DOUBLE) / 2000.0) AS ask,
    CAST((k % 7) + 1 AS BIGINT) AS bid_size,
    CAST((k % 11) + 1 AS BIGINT) AS ask_size
  FROM (
    SELECT *,
           value * (1.0 + CAST((k % 9) - 4 AS DOUBLE) / 10000.0) AS mid
    FROM (
      SELECT *, CAST(json_extract(props, '$.k') AS INTEGER) AS k
      FROM events
      WHERE event_type IN ('click', 'view', 'purchase', 'signup')
        AND json_extract(props, '$.k') IS NOT NULL
    )
  )
)
"""


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
