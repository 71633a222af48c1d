#!/usr/bin/env python
"""Round-10 scale probes.

1. GRAPH FAMILY AT 100x EDGES (verdict item 3): lineitem unioned with
   shifted order/part keys -> 100x orders of identical shape, then
   part_copurchase_{pagerank,triangles,communities_lpa} with wall time
   AND total shuffle write bytes per run (captured from the UI REST
   API — stage-level shuffleWriteBytes summed before/after). Claims
   under test: PageRank iterations shuffle |edges| (linear), triangle
   wedges stay <= m^1.5 under degree orientation, LPA rounds shuffle
   |edges| (linear).
2. FUNNEL/RETENTION SHAPES AT 10x EVENTS (verdict item 7):
   funnel_time_to_convert, user_event_top_paths,
   user_clamped_balance_stats — all per-user windows whose parallelism
   claim is |users| >> cores; wall should track the scan.

Usage: python tools/scale_probe_r10.py [sf_dir]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def shuffle_write_bytes(spark) -> int:
    """Total shuffle write bytes across all completed stages (UI REST)."""
    try:
        base = spark.sparkContext.uiWebUrl
        app = spark.sparkContext.applicationId
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}/stages?status=complete"
        ) as r:
            stages = json.load(r)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)
    except Exception as ex:  # noqa: BLE001
        print(f"  (shuffle-bytes capture unavailable: {ex})")
        return -1


def timed(spark, fn):
    b0 = shuffle_write_bytes(spark)
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    b1 = shuffle_write_bytes(spark)
    sh = (b1 - b0) if b0 >= 0 and b1 >= 0 else -1
    return dt, sh, out


def union_shifted(df, col_shifts: dict[str, int], mult: int):
    parts = [
        df.select(
            *[
                (F.col(c) + F.lit(i * s)).alias(c) if s else F.col(c)
                for c, s in col_shifts.items()
            ]
        )
        for i in range(mult)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "24g")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.retainedStages", "20000")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

    # ------------------------------------------------ graph family 100x
    print("== graph family: edges x1 / x10 / x100 ==")
    root = tempfile.mkdtemp(prefix="gr_probe_")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    for mult, tag in ((1, "1x"), (10, "10x"), (100, "100x")):
        d = os.path.join(root, tag)
        os.makedirs(d, exist_ok=True)
        union_shifted(
            li, {"l_orderkey": 10_000_000, "l_partkey": 0}, mult
        ).write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        for q in (
            "part_copurchase_pagerank",
            "part_copurchase_triangles",
            "part_copurchase_communities_lpa",
        ):
            dt, sh, n = timed(
                spark, lambda q=q, d=d: plans.get(q).fn(spark, d).count()
            )
            gb = f"{sh / 1e9:.2f} GB" if sh >= 0 else "n/a"
            print(f"  {tag} {q}: {dt:.1f}s shuffleWrite={gb} rows={n}")

    # ------------------------------------- funnel/retention shapes 10x
    print("== funnel/retention per-user windows: events x10 ==")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    for mult, tag in ((1, "1x"), (10, "10x")):
        d = tempfile.mkdtemp(prefix=f"fn_probe_{tag}_")
        parts = [
            ev.withColumn(
                "event_id", F.col("event_id") + F.lit(i * 100_000_000)
            ).withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000))
            for i in range(mult)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
        for q in (
            "funnel_time_to_convert",
            "user_event_top_paths",
            "user_clamped_balance_stats",
        ):
            dt, sh, n = timed(
                spark, lambda q=q, d=d: plans.get(q).fn(spark, d).count()
            )
            gb = f"{sh / 1e9:.2f} GB" if sh >= 0 else "n/a"
            print(f"  {tag} {q}: {dt:.1f}s shuffleWrite={gb} rows={n}")

    spark.stop()


if __name__ == "__main__":
    main()
