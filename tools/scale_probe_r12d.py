#!/usr/bin/env python
"""Round-12d scale probes for the second wave of r12 additions.

1. tick_imbalance_forward_returns / tick_cross_venue_staleness /
   streaming_cross_venue_staleness_1m at events x1/x10 (ts-interleaved).
2. candle_momentum_replay at x1/x10 ticks — the per-key series is
   CALENDAR-bounded, so wall must stay ~flat while ticks grow 10x.
3. doc_padding_waste_audit at documents x1/x10/x100 (doc_id shift).

Usage: python tools/scale_probe_r12d.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def _scaled_events(ev, mult):
    d = tempfile.mkdtemp(prefix=f"r12d{mult}x_")
    parts = [ev]
    for i in range(1, mult):
        parts.append(
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            .withColumn("ts", F.col("ts") + F.expr(f"INTERVAL {i * 7} SECONDS"))
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    return d


def _scaled_docs(docs, mult):
    d = tempfile.mkdtemp(prefix=f"r12dd{mult}x_")
    parts = [docs]
    for i in range(1, mult):
        parts.append(docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _bo2(plans, q, spark, d):
    best = None
    for _ in range(2):
        t0 = time.time()
        plans.get(q).fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    for mult in (1, 10):
        d = _scaled_events(ev, mult)
        for q in (
            "tick_imbalance_forward_returns",
            "tick_cross_venue_staleness",
            "candle_momentum_replay",
            "streaming_cross_venue_staleness_1m",
        ):
            print(f"x{mult} {q}: {_bo2(plans, q, spark, d):.1f}s", flush=True)

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for mult in (1, 10, 100):
        d = _scaled_docs(docs, mult)
        print(
            f"x{mult} doc_padding_waste_audit: "
            f"{_bo2(plans, 'doc_padding_waste_audit', spark, d):.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
