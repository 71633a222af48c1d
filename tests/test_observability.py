"""In-flight audit metrics (operators/observability.py): the observe()
counters must equal a separately-computed audit — batch via
Observation.get, streaming via StreamingQueryProgress.observedMetrics —
without adding a scan of their own."""

from __future__ import annotations

from datetime import datetime, timezone
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.observability import (
    ingest_audit_metrics,
    observe_stream,
    observed,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.ticks import (
    events_as_ticks,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.schemas import (
    SILVER_SCHEMA,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
    load_table,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.streaming.sources import (
    read_parquet_stream,
)

from conftest import SF_SMOKE


def test_batch_observation_matches_separate_audit(spark):
    ticks = events_as_ticks(load_table(spark, SF_SMOKE, "events"))
    wrapped, obs = observed(ticks, ingest_audit_metrics())
    wrapped.write.format("noop").mode("overwrite").save()
    got = obs.get
    expected = ticks.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("symbol").isNull(), 1)).alias("n_null_keys"),
        F.max("trade_timestamp").alias("max_event_ts"),
        F.min("trade_timestamp").alias("min_event_ts"),
    ).first()
    assert got["n_rows"] == expected["n_rows"] > 0
    assert got["n_null_keys"] == expected["n_null_keys"]
    assert got["max_event_ts"] == expected["max_event_ts"]
    assert got["min_event_ts"] == expected["min_event_ts"]


def test_stream_observation_reports_per_batch_metrics(spark, tmp_path):
    silver_dir = tmp_path / "silver"
    silver_dir.mkdir()
    ts = datetime(2026, 1, 1, 12, 0, 0, tzinfo=timezone.utc)
    schema = pa.schema(
        [
            ("venue", pa.string()),
            ("symbol", pa.string()),
            ("price", pa.decimal128(18, 8)),
            ("size", pa.decimal128(18, 8)),
            ("trade_id", pa.int64()),
            ("trade_timestamp", pa.timestamp("us", tz="UTC")),
            ("taker_side", pa.string()),
        ]
    )
    rows = [
        ("coinbase", "S0", Decimal("10.5"), Decimal("1"), i, ts, "buy")
        for i in range(7)
    ]
    cols = list(zip(*rows))
    pq.write_table(
        pa.table({n: list(c) for n, c in zip(schema.names, cols)}, schema=schema),
        str(silver_dir / "b0.parquet"),
    )

    stream = read_parquet_stream(spark, str(silver_dir), SILVER_SCHEMA)
    audited = observe_stream(
        stream, "ingest_audit", {"n_rows": F.count(F.lit(1))}
    )
    q = (
        audited.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    progresses = [p for p in q.recentProgress if p.get("observedMetrics")]
    assert progresses, "no progress carried observedMetrics"
    total = sum(
        p["observedMetrics"]["ingest_audit"]["n_rows"] for p in progresses
    )
    assert total == 7
