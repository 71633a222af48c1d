#!/usr/bin/env python
"""Scale probes for the round-9 continuation operators.

- part_copurchase_pagerank: axis = EDGE COUNT x10 (lineitem unioned with
  shifted order/part keys -> 10x orders of the same shape). The claim:
  each iteration is one |edges| shuffle into a |nodes| aggregate, so
  wall should scale ~linearly in edges, never quadratically.
- log compaction: axis = COMMIT COUNT x100 (30 -> 3000 commits). The
  claims: compact_log is a linear single pass over the range; snapshot
  build from ONE compaction beats replaying N JSONs; both measured.
- chunked_range_rolling (tick_rolling_volume_30m shape): axis = ROWS
  x10 via unioned shifted events; carry volume stays span/bucket-
  bounded so wall ~linear.
- grouping-set family (cube shape): axis = ROWS x10; Expand happens
  before the exchange, so the shuffle carries groups x sets partials
  and wall should track the scan, not the aggregate.

Usage: python tools/scale_probe_r9b.py [sf_dir]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.delta import (  # noqa: E501
        DeltaTable,
    )

    # ---------------------------------------------------------- pagerank
    print("== part_copurchase_pagerank: edges x10 ==")
    root = tempfile.mkdtemp(prefix="pr_probe_")
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    for mult, tag in ((1, "1x"), (10, "10x")):
        d = os.path.join(root, tag)
        os.makedirs(d, exist_ok=True)
        parts = [
            li.select(
                (F.col("l_orderkey") + F.lit(i * 10_000_000)).alias("l_orderkey"),
                F.col("l_partkey").alias("l_partkey"),
            )
            for i in range(mult)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(os.path.join(d, "lineitem.parquet"))
        dt, n = timed(
            lambda: plans.get("part_copurchase_pagerank").fn(spark, d).count()
        )
        print(f"  {tag}: {dt:.1f}s rows={n}")

    # ---------------------------------------------- log compaction x100
    print("== log compaction: commits x100 ==")
    for n_commits, tag in ((30, "30"), (3000, "3000")):
        t = DeltaTable(tempfile.mkdtemp(prefix="lc_probe_") + "/t")
        one = spark.range(0, 10).coalesce(1)
        for _ in range(n_commits):
            t.write(one)
        dt_c, name = timed(lambda: t.compact_log(0, n_commits - 1))
        # snapshot WITH compaction (walk hits the compacted file first)
        dt_s_comp, _ = timed(lambda: t._snapshot_state(None))
        # snapshot WITHOUT (rename it away): replays every JSON
        p = os.path.join(t._log_dir, name)
        os.rename(p, p + ".hide")
        dt_s_json, _ = timed(lambda: t._snapshot_state(None))
        os.rename(p + ".hide", p)
        print(
            f"  {tag} commits: compact={dt_c:.2f}s  "
            f"snapshot(comp)={dt_s_comp:.3f}s  snapshot(json)={dt_s_json:.3f}s"
        )

    # ------------------------------------- range rolling + cube on x10
    print("== tick_rolling_volume_30m / order_priority_status_cube: rows x10 ==")
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    od = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    big = tempfile.mkdtemp(prefix="rr_probe_")
    evs = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * 100_000_000))
        for i in range(10)
    ]
    u = evs[0]
    for p_ in evs[1:]:
        u = u.unionByName(p_)
    u.write.parquet(os.path.join(big, "events.parquet"))
    ods = [
        od.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000))
        for i in range(10)
    ]
    uo = ods[0]
    for p_ in ods[1:]:
        uo = uo.unionByName(p_)
    uo.write.parquet(os.path.join(big, "orders.parquet"))
    for name in ("tick_rolling_volume_30m", "order_priority_status_cube"):
        dt1, n1 = timed(lambda: plans.get(name).fn(spark, sf_dir).count())
        dt10, n10 = timed(lambda: plans.get(name).fn(spark, big).count())
        print(
            f"  {name}: 1x {dt1:.1f}s ({n1}) -> 10x {dt10:.1f}s ({n10}) "
            f"factor {dt10 / max(dt1, 1e-9):.1f}x"
        )

    spark.stop()


if __name__ == "__main__":
    main()
