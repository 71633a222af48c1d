"""Range join: end-exclusive containment, overlap fan-out, no nested loop."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.ranges import (
    interval_point_join,
)


def ts(minute: int, second: int = 0):
    return datetime(2024, 1, 1, 12, minute, second, tzinfo=timezone.utc)


def test_containment_is_end_exclusive_and_overlap_fans_out(spark):
    points = spark.createDataFrame(
        [(1, ts(0)), (2, ts(30)), (3, ts(59, 59)), (4, ts(5))],
        "pid int, t timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("a", ts(0), ts(30)),      # [12:00, 12:30) — end-exclusive
            ("b", ts(0), ts(10)),      # overlaps interval a
            ("c", ts(30), ts(59, 59)),  # [12:30, 12:59:59)
        ],
        "iid string, start timestamp, end timestamp",
    )
    got = interval_point_join(
        points, intervals, ts_col="t", chunk_seconds=600
    ).select("pid", "iid")
    pairs = {(r.pid, r.iid) for r in got.collect()}
    assert pairs == {
        (1, "a"),  # start-inclusive
        (1, "b"),
        (4, "a"),  # overlap: point 4 in both a and b
        (4, "b"),
        (2, "c"),  # 12:30 excluded from a (end-exclusive), included in c
    }
    # point 3 at 12:59:59 == end of c -> excluded everywhere


def test_plan_has_no_nested_loop(spark):
    points = spark.range(100).select(
        F.col("id").alias("pid"),
        F.timestamp_micros((F.col("id") * 60_000_000).cast("long")).alias("t"),
    )
    intervals = spark.range(5).select(
        F.col("id").alias("iid"),
        F.timestamp_micros((F.col("id") * 600_000_000).cast("long")).alias("start"),
        F.timestamp_micros(((F.col("id") + 1) * 600_000_000).cast("long")).alias("end"),
    )
    plan = interval_point_join(
        points, intervals, ts_col="t", chunk_seconds=600
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan
