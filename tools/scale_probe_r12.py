#!/usr/bin/env python
"""Round-12 scale probes (all numbers pasted into SCALE.md round-12).

1. MULTIMODAL at 10x AND 100x documents (verdict items 1+3):
   multimodal_image_near_dups (post dedup-first rewrite) and
   multimodal_png_stats, doc_id-shifted copies, warm best-of-2.
2. STREAMING OFI state accounting (verdict item 4): events x10/x100,
   wall + state-store checkpoint bytes per drain (key cardinality is
   the 3 fixture symbols — state must stay constant while ticks grow).
3. EXECUTABLE-ARBITRAGE PNL at 10x events (verdict item 6).
4. LPA/pagerank at 100x edges post basket-dedup (verdict item 5 fix).

Usage: python tools/scale_probe_r12.py [sf_dir]
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


def _du(root: str, sub: str = "ckpt/state") -> int:
    total = 0
    for dirpath, _dirs, files in os.walk(os.path.join(root, sub)):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def _scaled_dir(df, prefix: str, table: str, mult: int, shifts: dict) -> str:
    d = tempfile.mkdtemp(prefix=f"{prefix}{mult}x_")
    parts = [df]
    for i in range(1, mult):
        p = df
        for col, step in shifts.items():
            p = p.withColumn(col, F.col(col) + F.lit(i * step))
        parts.append(p)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    u.write.mode("overwrite").parquet(os.path.join(d, f"{table}.parquet"))
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

    print("== multimodal: documents x1/x10/x100 (doc_id-shifted) ==")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    for mult in (1, 10, 100):
        d = _scaled_dir(docs, "r12mm", "documents", mult, {"doc_id": 10_000_000})
        for q in ("multimodal_image_near_dups", "multimodal_png_stats"):
            print(f"  x{mult} {q}: {_bo2(plans, q, spark, d):.1f}s", flush=True)

    print("== streaming OFI: events x1/x10/x100, wall + state bytes ==")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    for mult in (1, 10, 100):
        d = _scaled_dir(ev, "r12ofi", "events", mult, {"event_id": 100_000_000})
        before = set(glob.glob(os.path.join(tempfile.gettempdir(), "cpsofi_*")))
        t0 = time.time()
        plans.get("streaming_order_flow_imbalance_1m").fn(spark, d).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = time.time() - t0
        new = set(glob.glob(os.path.join(tempfile.gettempdir(), "cpsofi_*"))) - before
        state = sum(_du(r) for r in new)
        print(f"  x{mult}: wall={wall:.1f}s state_bytes={state}", flush=True)

    print("== executable-arb PnL: events x1/x10 (warm bo2) ==")
    for mult in (1, 10):
        d = _scaled_dir(ev, "r12arb", "events", mult, {"event_id": 100_000_000})
        print(
            f"  x{mult} arb_executable_pnl_1m: "
            f"{_bo2(plans, 'arb_executable_pnl_1m', spark, d):.1f}s",
            flush=True,
        )

    print("== graph: lineitem x1/x100 (orderkey-shifted) post basket-dedup ==")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    for mult in (1, 100):
        d = _scaled_dir(li, "r12lpa", "lineitem", mult, {"l_orderkey": 10_000_000})
        for q in ("part_copurchase_communities_lpa", "part_copurchase_pagerank"):
            print(f"  x{mult} {q}: {_bo2(plans, q, spark, d):.1f}s", flush=True)


if __name__ == "__main__":
    main()
