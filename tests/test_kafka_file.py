"""File-backed Kafka topic twin (S1/K4 stand-in): record contract,
partitioner, offset density, streaming subscription, producer roundtrip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.kafka_file import (
    KAFKA_RECORD_SCHEMA,
    FileTopic,
    partition_for_key,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.streaming.sinks import (
    drain,
    kafka_records,
    start_parquet_stream,
)


def make_records(spark, start, n):
    return spark.range(start, start + n).select(
        F.concat(F.lit("K"), (F.col("id") % 5).cast("string"))
        .cast("binary")
        .alias("key"),
        F.concat(F.lit("payload-"), F.col("id").cast("string"))
        .cast("binary")
        .alias("value"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("id")).alias("timestamp"),
    )


@pytest.fixture
def topic(tmp_path):
    return FileTopic(str(tmp_path / "topic"), "t", num_partitions=3)


class TestFileTopic:
    def test_record_contract_matches_kafka_source(self, spark, topic):
        topic.produce(make_records(spark, 0, 20))
        rec = topic.read(spark)
        assert rec.schema == KAFKA_RECORD_SCHEMA
        assert rec.count() == 20
        assert {r.topic for r in rec.select("topic").distinct().collect()} == {"t"}
        assert {r.timestampType for r in rec.collect()} == {0}

    def test_keyed_partitioning_is_stable(self, spark, topic):
        topic.produce(make_records(spark, 0, 50))
        rec = topic.read(spark).withColumn(
            "expected", partition_for_key(F.col("key"), 3)
        )
        assert rec.filter(F.col("partition") != F.col("expected")).count() == 0
        # same key always lands on the same partition
        per_key = (
            rec.groupBy(F.col("key").cast("string").alias("k"))
            .agg(F.countDistinct("partition").alias("nparts"))
            .collect()
        )
        assert all(r.nparts == 1 for r in per_key)

    def test_offsets_dense_across_produces(self, spark, topic):
        topic.produce(make_records(spark, 0, 20))
        topic.produce(make_records(spark, 20, 15))
        rec = topic.read(spark)
        for part, grp in (
            rec.groupBy("partition")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("offset").alias("mn"),
                F.max("offset").alias("mx"),
                F.countDistinct("offset").alias("uniq"),
            )
            .toPandas()
            .set_index("partition")
            .iterrows()
        ):
            assert grp["mn"] == 0, part
            assert grp["mx"] == grp["n"] - 1, part
            assert grp["uniq"] == grp["n"], part

    def test_stream_equals_batch_and_resumes(self, spark, topic, tmp_path):
        topic.produce(make_records(spark, 0, 12))
        out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        drain(start_parquet_stream(topic.read_stream(spark), path=out, checkpoint=ckpt))
        assert spark.read.parquet(out).count() == 12
        # a later produce surfaces incrementally, earlier segments not re-read
        topic.produce(make_records(spark, 12, 8))
        drain(start_parquet_stream(topic.read_stream(spark), path=out, checkpoint=ckpt))
        got = spark.read.parquet(out)
        assert got.count() == 20
        batch = topic.read(spark)
        assert {(bytes(r.key), bytes(r.value)) for r in got.collect()} == {
            (bytes(r.key), bytes(r.value)) for r in batch.collect()
        }

    def test_producer_records_roundtrip(self, spark, topic):
        """K4 twin: kafka_records envelope -> produce -> read -> parse."""
        src = spark.range(10).select(
            F.concat(F.lit("S"), (F.col("id") % 3).cast("string")).alias("symbol"),
            (F.col("id") * 1.5).alias("price"),
        )
        topic.produce(kafka_records(src, key="symbol"))
        back = topic.read(spark).select(
            F.col("key").cast("string").alias("symbol"),
            F.get_json_object(F.col("value").cast("string"), "$.price")
            .cast("double")
            .alias("price"),
        )
        assert {(r.symbol, r.price) for r in back.collect()} == {
            (r.symbol, r.price) for r in src.collect()
        }
