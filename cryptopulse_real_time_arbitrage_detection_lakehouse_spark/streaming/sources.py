"""Streaming sources (SURVEY.md S1/S2/S5 twins).

- `read_parquet_stream`: the file-stream source used everywhere the
  reference uses a Delta stream (S2) — incremental file listing plus
  ``maxFilesPerTrigger`` to shape micro-batches in tests.
- `rate_replay_ticks`: the reference's WebSocket producer replayed through
  Spark's ``rate`` source (S5 twin, ``/root/reference/src/producers/
  main.py:35-55``): emits Kafka-shaped rows (binary key/value + timestamp)
  whose value is the full ticker JSON payload via ``to_json`` (F8).
- `kafka_raw_stream`: the S1 Kafka source, built lazily — the
  spark-sql-kafka connector jar is not in this image, so starting the
  query raises; the wrapper exists so the wiring is real and documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_SYMBOLS = ("BTC-USD", "ETH-USD", "SOL-USD")


def read_parquet_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-stream source over a parquet directory (S2 twin).

    The file source tracks processed files in the checkpoint, so a chained
    job (bronze dir -> silver job) re-reads only new files per trigger —
    the same incremental contract as the reference's Delta stream.
    ``max_files_per_trigger`` bounds each micro-batch (used by the
    watermark tests to force multi-batch drains under ``availableNow``).
    """
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def rate_replay_ticks(
    spark: SparkSession,
    *,
    rows_per_second: int = 100,
    symbols: tuple[str, ...] = DEFAULT_SYMBOLS,
) -> DataFrame:
    """Kafka-shaped synthetic ticker stream from the ``rate`` source.

    Deterministic per ``value`` (the rate source's monotonic counter), so a
    bounded drain is reproducible. Payload fields mirror the reference
    producer's Coinbase ticker message (type/product_id/price/time/
    trade_id/last_size/side), serialized with ``to_json`` (F8) and cast to
    binary like a Kafka record (F4's inverse).
    """
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
    n = F.col("value")
    sym = F.element_at(
        F.array(*[F.lit(s) for s in symbols]), (n % len(symbols) + 1).cast("int")
    )
    # price walks deterministically around a per-symbol base; rendered as a
    # string because the wire format carries numerics as strings.
    price = F.format_number(
        F.lit(100.0) + (n % len(symbols)).cast("double") * 100 + (n % 997).cast("double") / 100.0,
        8,
    )
    payload = F.to_json(
        F.struct(
            F.lit("ticker").alias("type"),
            n.alias("sequence"),
            sym.alias("product_id"),
            price.alias("price"),
            F.date_format(F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'").alias(
                "time"
            ),
            n.alias("trade_id"),
            F.format_number((n % 13).cast("double") / 10.0 + 0.1, 8).alias("last_size"),
            F.when(n % 2 == 0, F.lit("buy")).otherwise(F.lit("sell")).alias("side"),
        )
    )
    return raw.select(
        F.lit("coinbase").cast("binary").alias("key"),
        payload.cast("binary").alias("value"),
        F.col("timestamp"),
    )


def kafka_raw_stream(
    spark: SparkSession,
    *,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = False,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Kafka streaming source (S1 twin of ``ingestion_bronze.py:43-52``).

    Built lazily: constructing the reader succeeds anywhere, but starting a
    query requires the ``spark-sql-kafka-0-10`` connector on the classpath
    (not shipped in this image — use `rate_replay_ticks` as the documented
    substitute; the downstream jobs accept either, both are Kafka-shaped).
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.load()
