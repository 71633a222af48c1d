#!/usr/bin/env python
"""Round-12b scale probes for the late-round additions (paste -> SCALE.md).

1. tick_hayashi_yoshida_covariance at events x1/x10/x100 — copies are
   ts-INTERLEAVED (i*7s shift, event_id shift keeps venue parity) so the
   tape genuinely densifies and the adaptive bucket width must step down
   the ladder to keep per-bucket candidate mass O(1).
2. multimodal_video_near_dups at documents x1/x10/x100 (doc_id shift) —
   the VID1 recipe is periodic in doc_id (period 1280), so larger corpora
   contain real exact-dup classes and the dedup-first collapse is live.
3. arb_executable_pnl_net_1m at events x1/x10.

Usage: python tools/scale_probe_r12b.py [sf_dir]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def _scaled_events(ev, mult: int) -> str:
    d = tempfile.mkdtemp(prefix=f"r12hy{mult}x_")
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


def _scaled_docs(docs, mult: int) -> str:
    d = tempfile.mkdtemp(prefix=f"r12vid{mult}x_")
    parts = [docs]
    for i in range(1, mult):
        parts.append(docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))
    return d


def _bo2(plans, q: str, spark, d: str) -> float:
    best = None
    for _ in range(2):
        t0 = time.time()
        plans.get(q).fn(spark, d).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best


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
    print("== Hayashi-Yoshida: events x1/x10/x100 (ts-interleaved) ==")
    for mult in (1, 10, 100):
        d = _scaled_events(ev, mult)
        print(
            f"  x{mult} tick_hayashi_yoshida_covariance: "
            f"{_bo2(plans, 'tick_hayashi_yoshida_covariance', spark, d):.1f}s",
            flush=True,
        )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print("== video near-dups: documents x1/x10/x100 (doc_id-shifted) ==")
    for mult in (1, 10, 100):
        d = _scaled_docs(docs, mult)
        print(
            f"  x{mult} multimodal_video_near_dups: "
            f"{_bo2(plans, 'multimodal_video_near_dups', spark, d):.1f}s",
            flush=True,
        )

    print("== net-PnL arb: events x1/x10 ==")
    for mult in (1, 10):
        d = _scaled_events(ev, mult)
        print(
            f"  x{mult} arb_executable_pnl_net_1m: "
            f"{_bo2(plans, 'arb_executable_pnl_net_1m', spark, d):.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
