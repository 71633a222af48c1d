"""Bronze -> Silver: JSON parse, filter, typed projection.

Re-expresses the reference's silver job (``src/jobs/process_silver.py:87-124``,
SURVEY.md P2/P3/P5/F1-F3) as a pure transform usable under both batch and
streaming reads. Semantics pinned by the reference:

- ``from_json`` yields a null struct on malformed input, and null fields for
  missing keys; the not-null filter below therefore drops malformed rows
  (SURVEY.md F1, section 7.4).
- message-type gate: keep ``ticker`` / ``ticker_batch`` only
  (``process_silver.py:102-105``).
- numerics arrive as JSON strings and are cast ``string -> decimal(18,8)``
  (``process_silver.py:110``); malformed numerics become null, not errors.

Scale notes: this stage is stateless and narrow (no shuffle — the plan is
Scan > Project > Filter > Project inside one WholeStageCodegen span), so it
scales linearly with input splits; at 100 TB the only knob that matters is
input split sizing (``spark.sql.files.maxPartitionBytes``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..schemas import PRICE_DECIMAL, TICKER_PAYLOAD_SCHEMA

#: message types that survive the silver gate (process_silver.py:102-105)
TICK_TYPES = ("ticker", "ticker_batch")


def parse_bronze_ticks(bronze: DataFrame) -> DataFrame:
    """Bronze envelope (key/json_payload/...) -> typed silver ticks.

    Keeps the two fields the reference drops but its claimed features need:
    ``last_size`` (true VWAP) and the venue key (arbitrage joins) —
    SURVEY.md section 0.1 / 2.6.
    """
    parsed = bronze.withColumn(
        "parsed", F.from_json(F.col("json_payload"), TICKER_PAYLOAD_SCHEMA)
    )
    gated = parsed.filter(
        F.col("parsed.type").isin(*TICK_TYPES) & F.col("parsed.product_id").isNotNull()
    )
    return gated.select(
        F.col("key").alias("venue"),
        F.col("parsed.product_id").alias("symbol"),
        F.col("parsed.price").cast(PRICE_DECIMAL).alias("price"),
        F.col("parsed.last_size").cast(PRICE_DECIMAL).alias("size"),
        F.col("parsed.trade_id").alias("trade_id"),
        F.col("parsed.time").cast("timestamp").alias("trade_timestamp"),
        F.col("parsed.side").alias("taker_side"),
    )


def with_audit_column(df: DataFrame, name: str = "silver_processed_at") -> DataFrame:
    """Processing-time audit column (reference F5); kept OUT of compared
    projections because it is non-deterministic (SURVEY.md section 7.4)."""
    return df.withColumn(name, F.current_timestamp())
