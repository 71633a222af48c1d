#!/usr/bin/env python
"""Round-12 optimization probe: per-query timing breakdown.

For each named query, measures at the bench's sf (default sf0.1):
- build_s: Python plan-construction time (fn() call — driver-side,
  includes fixture builds on first touch)
- cold_s: first noop-sink execution
- warm_s: best of N (default 3) subsequent noop-sink runs
- jobs/stages/tasks executed during the warm best run (from the
  status tracker), to attribute fixed scheduling overhead

Usage: python tools/opt_probe_r12.py [-n N] query [query ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans  # noqa: E402
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.session import (  # noqa: E402
    get_spark,
)


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-n":
        reps = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-probe-r12")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    print(f"# sf_dir={sf_dir} cores={sc.defaultParallelism} reps={reps}")
    print(f"{'query':42s} {'build_s':>8s} {'cold_s':>8s} {'warm_s':>8s} {'jobs':>5s}")
    for name in args:
        spec = plans.get(name)
        sc.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        cold = time.perf_counter() - t0
        warm = float("inf")
        jobs_best = -1
        for _ in range(reps):
            j0 = tracker.getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df2 = spec.fn(spark, sf_dir)
            df2.write.format("noop").mode("overwrite").save()
            el = time.perf_counter() - t0
            j1 = tracker.getJobIdsForGroup(None)
            if el < warm:
                warm = el
                jobs_best = len(set(j1) - set(j0))
        print(f"{name:42s} {build:8.3f} {cold:8.3f} {warm:8.3f} {jobs_best:5d}")
        sc.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
