#!/usr/bin/env python
"""10x probes for the round-11 registered queries (standard treatment:
events x10 via unioned shifted copies, warm best-of-2 per scale).

Usage: python tools/scale_probe_r11.py [sf_dir]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

QUERIES = (
    "tick_roll_spread_estimate",
    "tick_kyle_lambda",
    "tick_lee_ready_classification",
    "candle_realized_variance_jumps",
    "tick_quoted_spread_1m",
    "tick_effective_spread_by_side",
    "tick_microprice_drift",
    "tick_quote_imbalance_1h",
    "tick_nbbo_crossed_markets",
)


def main() -> None:
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
    for mult, tag in ((1, "1x"), (10, "10x")):
        d = tempfile.mkdtemp(prefix=f"r11_{tag}_")
        parts = [
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 100_000_000)
            )
            for i in range(mult)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        for q in QUERIES:
            best = None
            for _ in range(2):
                t0 = time.time()
                plans.get(q).fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"  {tag} {q}: {best:.1f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
