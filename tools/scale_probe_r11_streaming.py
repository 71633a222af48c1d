#!/usr/bin/env python
"""100x probes for the physically-drained STATEFUL streaming queries
(round-11 verdict item 4): session windows, the custom
applyInPandasWithState sessionizer, and the stream-stream joins.

Scaling treatment: events x10 / x100 by unioning USER-shifted copies
(user_id + i*100000, event_id + i*100000000) — this multiplies the
STATE CARDINALITY (active users / join keys), which is what breaks at
scale; an event_id-only shift would re-stack the same 1 500 users.

Besides wall time, measures the state-store checkpoint bytes each drain
leaves behind (the queries build their fixtures under known /tmp
prefixes; we diff the directory set around each run).

Usage: python tools/scale_probe_r11_streaming.py [sf_dir]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import glob
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402

QUERIES = (
    "streaming_session_windows",
    "streaming_user_sessions_stateful",
    "streaming_click_purchase_interval_join",
    "streaming_purchase_attribution_full_outer",
)

_PREFIXES = ("cpsess_", "cpssjoin_", "cpfojoin_")


def _ckpt_dirs() -> set[str]:
    t = tempfile.gettempdir()
    return {d for p in _PREFIXES for d in glob.glob(os.path.join(t, p + "*"))}


def _du(paths: set[str], sub: str = "ckpt/state") -> int:
    total = 0
    for root in paths:
        for dirpath, _dirs, files in os.walk(os.path.join(root, sub)):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(dirpath, f))
                except OSError:
                    pass
    return total


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
    for mult, tag in ((1, "1x"), (10, "10x"), (100, "100x")):
        d = tempfile.mkdtemp(prefix=f"r11s_{tag}_")
        parts = [
            ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
            .withColumn("user_id", F.col("user_id") + F.lit(i * 100_000))
            for i in range(mult)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        for q in QUERIES:
            before = _ckpt_dirs()
            t0 = time.time()
            plans.get(q).fn(spark, d).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.time() - t0
            state_b = _du(_ckpt_dirs() - before)
            print(
                f"  {tag} {q}: {dt:.1f}s state={state_b/1e6:.1f}MB",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
