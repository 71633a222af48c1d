"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans``): every
implemented operator from SURVEY.md section 2 is registered there with its
Spark callable and (when SQL-expressible) its DuckDB oracle twin.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: events -> silver parse -> 1-minute OHLC+VWAP
    gold candles (the reference's whole medallion pipeline in one plan)."""
    return plans.get("gold_candles_1m").fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    return plans.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin per query (same column names, exact-match values)."""
    return plans.all_oracles()
