"""File-backed Kafka topic twin (SURVEY.md S1/K4 without the connector jar).

The reference ingests from a real Kafka topic
(``/root/reference/src/jobs/ingestion_bronze.py:43-52``) and produces to it
(``src/producers/main.py:49-58``). The ``spark-sql-kafka-0-10`` connector
jar is not in this image and there is no network to fetch it, so the S1/K4
wrappers in ``streaming/sources.py``/``streaming/sinks.py`` can be built
but never started. This module is the runnable stand-in: a *topic as a
directory of parquet segment files* exposing exactly the Kafka source's
record contract —

    key binary, value binary, topic string, partition int, offset long,
    timestamp timestamp, timestampType int (0 = CreateTime)

so every downstream consumer (the bronze envelope projection P1/F4, the
silver parse, the streaming jobs) runs unmodified against either source.

Semantics mirrored from Kafka:

- **Keyed partitioning**: a record's partition is a stable hash of its key
  modulo the partition count (Kafka's default partitioner shape; the hash
  here is md5-prefix — not murmur2 — chosen because both Spark and the
  DuckDB oracle can recompute it exactly).
- **Per-partition contiguous offsets**: each ``produce`` assigns offsets
  ``max_existing+1 ..`` per partition; a topic's (partition, offset) pairs
  are dense from 0 with no gaps — the invariant the registered audit query
  checks.
- **Append-only segments**: a produce never rewrites existing files, so
  Spark's streaming file source over the directory is a faithful
  ``startingOffsets=earliest`` subscription: incremental discovery, replay
  from the beginning on a fresh checkpoint, exactly-once with the file
  sink's WAL.

Scale: ``produce`` shuffles once on the partition column to assign
per-partition row numbers — the same per-partition total-order contract a
real Kafka broker enforces; the existing-offset lookup reads only the
parquet footers' column stats of prior segments and reduces to
``num_partitions`` rows driver-side (bounded constants, not data).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window as W

#: the Kafka source's fixed record schema (spark-sql-kafka contract).
KAFKA_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("key", T.BinaryType(), True),
        T.StructField("value", T.BinaryType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("partition", T.IntegerType(), True),
        T.StructField("offset", T.LongType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("timestampType", T.IntegerType(), True),
    ]
)


def partition_for_key(key, num_partitions: int):
    """Stable key -> partition column: first 8 md5 hex digits as an int,
    mod the partition count. Oracle twin (DuckDB):
    ``CAST(('0x' || substring(md5(key), 1, 8)) AS BIGINT) % n``."""
    key_str = key.cast("string") if hasattr(key, "cast") else F.col(key).cast("string")
    return (
        F.conv(F.substring(F.md5(key_str), 1, 8), 16, 10).cast("long")
        % num_partitions
    ).cast("int")


class FileTopic:
    """A Kafka topic persisted as parquet segments under ``path``."""

    def __init__(self, path: str, name: str, *, num_partitions: int = 3) -> None:
        self.path = path
        self.name = name
        self.num_partitions = num_partitions

    def _next_offsets(self, spark: SparkSession) -> dict[int, int]:
        """First free offset per partition (bounded: one row per partition)."""
        if not os.path.isdir(self.path) or not any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        ):
            return {}
        existing = spark.read.schema(KAFKA_RECORD_SCHEMA).parquet(self.path)
        rows = (
            existing.groupBy("partition")
            .agg(F.max("offset").alias("mx"))
            .collect()
        )
        return {r["partition"]: r["mx"] + 1 for r in rows}

    def produce(self, records: DataFrame) -> None:
        """Append ``records`` (key, value[, timestamp]) to the topic.

        Keys/values may be binary or string (cast to binary like the Kafka
        producer does); a missing timestamp becomes the broker-style
        CreateTime ``current_timestamp()``. One shuffle on the partition
        column assigns the per-partition contiguous offsets.
        """
        spark = records.sparkSession
        base = self._next_offsets(spark)
        ts = (
            F.col("timestamp")
            if "timestamp" in records.columns
            else F.current_timestamp()
        )
        keyed = records.select(
            F.col("key").cast("binary").alias("key"),
            F.col("value").cast("binary").alias("value"),
            ts.alias("timestamp"),
        ).withColumn("partition", partition_for_key(F.col("key"), self.num_partitions))
        base_expr = F.coalesce(
            *[
                F.when(F.col("partition") == p, F.lit(off))
                for p, off in base.items()
            ],
            F.lit(0),
        ) if base else F.lit(0)
        out = keyed.select(
            "key",
            "value",
            F.lit(self.name).alias("topic"),
            "partition",
            (
                F.row_number().over(
                    W.partitionBy("partition").orderBy("timestamp", "value")
                )
                - 1
                + base_expr
            ).cast("long").alias("offset"),
            "timestamp",
            F.lit(0).alias("timestampType"),
        )
        # stage-then-rename so a concurrent reader never lists a partial
        # segment (the same visibility discipline as the Delta writer)
        stage = os.path.join(self.path, f"_seg-{uuid.uuid4().hex}")
        out.write.mode("errorifexists").parquet(stage)
        os.makedirs(self.path, exist_ok=True)
        for name in os.listdir(stage):
            if name.endswith(".parquet") and not name.startswith(("_", ".")):
                os.rename(
                    os.path.join(stage, name),
                    os.path.join(self.path, f"seg-{uuid.uuid4().hex}.parquet"),
                )
        for leftover in os.listdir(stage):
            os.remove(os.path.join(stage, leftover))
        os.rmdir(stage)

    def read(self, spark: SparkSession) -> DataFrame:
        """Batch subscription (``spark.read.format("kafka")`` twin)."""
        return spark.read.schema(KAFKA_RECORD_SCHEMA).parquet(self.path)

    def read_stream(
        self, spark: SparkSession, *, max_files_per_trigger: int | None = None
    ) -> DataFrame:
        """Streaming subscription from the earliest offset (S1 twin).

        A file stream over the append-only segment directory: new produces
        surface as new files per micro-batch, and the checkpoint's file
        log plays the consumer-group offset store.
        """
        reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.path)
