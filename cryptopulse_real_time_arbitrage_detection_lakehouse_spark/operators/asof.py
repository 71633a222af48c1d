"""As-of (nearest-earlier) join — an operator Spark lacks natively.

SURVEY.md section 2.6 plans it as composition: Spark's built-in joins +
window rank. Two strategies:

- `asof_join` (tolerance required): **bucketed range join** — the scale
  path. Both sides are bucketed on ``floor(epoch / tolerance)``; the right
  side is replicated into each bucket it can serve (its own and the next),
  so the join is a pure EQUI-join on (keys, bucket) and every left row
  meets only right rows within its tolerance horizon. Candidate pairs per
  left row are bounded by right-side density x tolerance — independent of
  total data size — instead of the O(|group|^2) blowup of a naive
  ``b.ts <= a.ts`` theta-join. Then one window rank picks the latest
  match. Cost: 2 shuffles (join + rank) and a 2x replication of the
  right side.

DuckDB oracle twin: native ``ASOF JOIN`` + tolerance filter.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "trade_timestamp",
    right_ts: str = "trade_timestamp",
    tolerance_seconds: int,
    left_id: str,
    right_cols: Sequence[str] | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right.ts in [left.ts - tolerance, left.ts]`` and equal ``on`` keys
    (inner: unmatched left rows are dropped).

    ``left_id`` must be unique per left row (rank anchor). ``right_cols``
    limits the attached columns (default: right_ts only). ``right_tiebreak``
    (a unique right-side column, e.g. a trade id) makes the surviving match
    deterministic when several right rows share the winning timestamp —
    DuckDB's native ASOF JOIN picks an arbitrary row on such ties, so tied
    testdata would need the oracle pinned the same way.
    """
    tol = int(tolerance_seconds)
    keep = list(right_cols or [])
    if right_tiebreak is not None and right_tiebreak not in keep:
        keep.append(right_tiebreak)
    lb = left.withColumn("__bucket", F.expr(f"unix_micros({left_ts}) DIV {tol * 1_000_000}"))
    r_base = right.select(
        *on,
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in keep],
        F.expr(f"unix_micros({right_ts}) DIV {tol * 1_000_000}").alias("__rbucket"),
    )
    # Replicate each right row into its own bucket and the next one: a left
    # row in bucket k can only match right rows in buckets k-1 and k.
    rb = r_base.withColumn("__bucket", F.explode(F.array(F.col("__rbucket"), F.col("__rbucket") + 1))).drop(
        "__rbucket"
    )
    rts = F.col(f"{right_ts}{suffix}")
    lts = F.col(left_ts)
    joined = lb.join(rb, [*on, "__bucket"]).filter(
        (rts <= lts) & (rts >= lts - F.expr(f"INTERVAL {tol} SECONDS"))
    )
    order = [rts.desc()]
    if right_tiebreak is not None:
        order.append(F.col(f"{right_tiebreak}{suffix}").desc())
    w = W.partitionBy(left_id).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__bucket")
    )
