"""Range (interval-containment) join: points into ``[start, end)`` intervals.

Spark has no native range-join strategy: a bare ``ts BETWEEN start AND end``
condition plans as BroadcastNestedLoopJoin — O(points x intervals) — which
dies long before 100 TB. This operator uses the standard chunk-bucketing
rewrite (the same idea as `operators.asof`): quantize time into fixed
chunks, explode each interval over the chunks it covers, tag each point
with its single chunk, equi-join on the chunk id, and post-filter the
exact range predicate.

Cost: shuffle of points (1 row each) + intervals (interval_len/chunk rows
each) hash-partitioned on chunk id, then a partition-local filter. Each
(point, interval) pair meets in EXACTLY one chunk — the point's — so no
distinct is needed. Chunk size trades interval blow-up against per-chunk
match density; pick it near the typical interval length.

Overlapping intervals are fine (a point matching k intervals emits k rows
— that is the join's semantics, identical to the SQL inequality join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

US_PER_SECOND = 1_000_000


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    chunk_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``start <= ts < end`` (end-exclusive), without a nested-loop plan.

    Returns points columns + intervals columns (minus start/end chunk
    artifacts); column names must not collide apart from the join bookkeeping.
    """
    chunk_us = chunk_seconds * US_PER_SECOND
    p_chunk = F.floor(F.unix_micros(F.col(ts_col)) / F.lit(chunk_us))
    i_first = F.floor(F.unix_micros(F.col(start_col)) / F.lit(chunk_us))
    # end-exclusive: the last covered chunk holds end - 1 microsecond
    i_last = F.floor((F.unix_micros(F.col(end_col)) - 1) / F.lit(chunk_us))

    i2 = intervals.withColumn("__chunk", F.explode(F.sequence(i_first, i_last)))
    p2 = points.withColumn("__chunk", p_chunk)
    joined = p2.join(i2, "__chunk", how).filter(
        (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    )
    return joined.drop("__chunk")
