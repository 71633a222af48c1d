"""Scale-safe trailing-row rolling windows: `chunked_rolling`.

The naive plan for a per-key trailing frame (``ROWS BETWEEN k-1
PRECEDING AND CURRENT ROW``) is a window over ``PARTITION BY key`` —
with a low-cardinality key (3 symbols here; one instrument group in the
reference's dashboard, ``/root/reference/src/dashboard/app.py:70-86``)
that stage has parallelism = |keys| at any cluster size, the same
bottleneck `operators.chunked_lag` removes for ``lag``. This operator
generalizes the fix to arbitrary trailing-frame aggregates:

1. rows are bucketed into (key, chunk) by a caller-supplied monotone
   chunk expression (e.g. the UTC day of a per-minute series);
2. a per-(key, chunk) DESC row_number marks each chunk's last ``k-1``
   rows, which are REPLICATED into the next chunk as carry rows — the
   only data a trailing k-row frame can reach across the boundary;
3. the frame runs inside each (key, chunk) partition over carry + own
   rows — parallel over keys x chunks — and carry rows are dropped from
   the output (they were only frame context).

Chunk successor-ship uses a DENSE index built from the (key, chunk)
summary (a per-key sequential pass over |chunks| rows, not data — the
`chunked_lag` trick), so missing calendar days cannot silently break
adjacency.

PRECONDITION (documented, oracle-checked in the queries that use this):
every non-first chunk must hold at least ``frame_rows - 1`` rows,
otherwise a frame would need carry from TWO chunks back. For a
per-minute series and day chunks that allows frames up to 1441 rows;
pick coarser chunks for sparser series. The registered indicator
queries run under the DuckDB hash gate, so a violation surfaces as a
mismatch, never silently.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = [
    "chunked_rolling",
    "chunked_cumsum",
    "chunked_locf",
    "chunked_range_rolling",
]


def chunked_rolling(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    chunk: Column,
    frame_rows: int,
    cols: Mapping[str, Callable[[W], Column]],
) -> DataFrame:
    """Append trailing-``frame_rows`` windowed columns per key.

    ``cols`` maps output name -> builder taking the frame's WindowSpec
    (e.g. ``lambda w: F.sum("x").over(w)``). Rows whose global trailing
    frame is shorter than ``frame_rows`` (the first rows of each key)
    keep their partial-frame values, exactly as the single-partition
    window would produce; callers wanting full frames only should also
    request a count column and filter on it.
    """
    if frame_rows < 2:
        raise ValueError("frame_rows must be >= 2 (use a plain select)")
    d = df.withColumn("__chunk", chunk)
    # dense per-key chunk index from the tiny (key, chunk) summary; the
    # sequential pass is over |keys| x |chunks| rows, never data
    summary = d.select(*key_cols, "__chunk").distinct()
    idx = summary.withColumn(
        "__cidx",
        F.row_number().over(W.partitionBy(*key_cols).orderBy("__chunk")),
    )
    d = d.join(F.broadcast(idx), [*key_cols, "__chunk"])
    w_desc = W.partitionBy(*key_cols, "__cidx").orderBy(F.col(order_col).desc())
    dd = d.withColumn("__rnd", F.row_number().over(w_desc))
    carry = (
        dd.filter(F.col("__rnd") <= frame_rows - 1)
        .withColumn("__cidx", F.col("__cidx") + 1)
        .withColumn("__carry", F.lit(True))
    )
    u = dd.withColumn("__carry", F.lit(False)).unionByName(carry)
    w = (
        W.partitionBy(*key_cols, "__cidx")
        .orderBy(order_col)
        .rowsBetween(-(frame_rows - 1), 0)
    )
    out = u.select("*", *[fn(w).alias(name) for name, fn in cols.items()])
    return out.filter(~F.col("__carry")).drop(
        "__chunk", "__cidx", "__rnd", "__carry"
    )


def chunked_cumsum(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    chunk: Column,
    out_col: str = "cumsum",
) -> DataFrame:
    """Append ``out_col`` = running ``SUM(value_col)`` within ``key_cols``
    ordered by ``order_col`` — the UNBOUNDED-PRECEDING prefix scan that
    trailing frames (`chunked_rolling`) cannot express.

    The naive plan (``SUM OVER (PARTITION BY key ORDER BY ord ROWS
    UNBOUNDED PRECEDING)``) pushes each key's entire history through one
    task — parallelism = |keys| forever, the same few-distinct-key
    ceiling `chunked_lag` removes. A prefix sum decomposes exactly where
    a trailing frame does not: the running total at any row is its
    chunk-local prefix plus the closed sum of all earlier chunks. So:

    1. local prefix sums run inside (key, chunk) partitions — parallel
       over keys x chunks;
    2. per-chunk TOTALS (one row per (key, chunk)) take the sequential
       pass: an exclusive prefix over the summary, never the data;
    3. the per-chunk offsets broadcast-join back and add on.

    Exact for integer/decimal values (the callers' quantized-grid
    discipline); float callers accept the usual reassociation. ``chunk``
    must be a monotone function of ``order_col``, same contract as
    `chunked_lag` — and unlike the rolling operator there is NO minimum
    chunk-population precondition: empty chunks simply contribute zero
    to later offsets.
    """
    d = df.withColumn("__chunk", chunk)
    w_local = (
        W.partitionBy(*key_cols, "__chunk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = d.withColumn("__local", F.sum(value_col).over(w_local))
    totals = local.groupBy(*key_cols, "__chunk").agg(
        F.sum(value_col).alias("__tot")
    )
    w_prior = (
        W.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *key_cols, "__chunk", F.sum("__tot").over(w_prior).alias("__off")
    )
    joined = local.join(F.broadcast(offsets), [*key_cols, "__chunk"])
    zero = F.lit(0).cast(joined.schema["__local"].dataType)
    return joined.withColumn(
        out_col, F.col("__local") + F.coalesce(F.col("__off"), zero)
    ).drop("__chunk", "__local", "__off")


def chunked_locf(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    chunk: Column,
    out_col: str = "locf",
) -> DataFrame:
    """Append ``out_col`` = last non-null ``value_col`` at or before each
    row within ``key_cols`` ordered by ``order_col`` — forward fill /
    last-observation-carried-forward, the gap-filling primitive
    (TimescaleDB's ``locf``, pandas ``ffill``).

    Same decomposition as `chunked_cumsum`, because LOCF is a prefix
    scan too (over the "last non-null" monoid instead of +): the filled
    value at any row is its chunk-local forward fill, or — where the
    chunk has seen no observation yet — the last observation of any
    earlier chunk. The naive ``last(value, ignorenulls) OVER (PARTITION
    BY key ORDER BY ord ROWS UNBOUNDED PRECEDING)`` pushes each key's
    entire history through one task; here:

    1. chunk-local fill runs inside (key, chunk) partitions — parallel
       over keys x chunks;
    2. the per-chunk LAST OBSERVATION summary (one row per observed
       (key, chunk); ``max_by`` over the non-null rows) takes the
       sequential pass — a window over the summary, never the data;
    3. each chunk's carry-in (last observation of any strictly earlier
       chunk) broadcast-joins back; out = coalesce(local, carry).

    Chunks with zero observations need no special case: they are absent
    from the summary (contributing nothing to later carries) and their
    own rows take the carry-in through the coalesce. Rows before the
    first observation of a key stay NULL — the caller decides the
    leading-edge policy, exactly like SQL's IGNORE NULLS frame. ``chunk``
    must be monotone in ``order_col`` and ``order_col`` unique per key
    (ties would make "last" ambiguous in BOTH the naive window and the
    max_by summary), the same contract as `chunked_lag`.
    """
    d = df.withColumn("__chunk", chunk)
    w_local = (
        W.partitionBy(*key_cols, "__chunk")
        .orderBy(order_col)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    local = d.withColumn(
        "__local", F.last(value_col, ignorenulls=True).over(w_local)
    )
    obs = (
        d.filter(F.col(value_col).isNotNull())
        .groupBy(*key_cols, "__chunk")
        .agg(F.max_by(value_col, F.col(order_col)).alias("__last"))
    )
    # every chunk present in the DATA (observed or not) needs a carry row,
    # so the prior-chunk scan runs over the distinct-chunk frame with the
    # summary left-joined on — both are |keys|x|chunks| rows
    chunks = d.select(*key_cols, "__chunk").distinct()
    w_prior = (
        W.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = chunks.join(obs, [*key_cols, "__chunk"], "left").select(
        *key_cols,
        "__chunk",
        F.last("__last", ignorenulls=True).over(w_prior).alias("__carry"),
    )
    joined = local.join(F.broadcast(carry), [*key_cols, "__chunk"])
    return joined.withColumn(
        out_col, F.coalesce("__local", "__carry")
    ).drop("__chunk", "__local", "__carry")


def chunked_range_rolling(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    bucket: int,
    span: int,
    cols: Mapping[str, Callable[[W], Column]],
) -> DataFrame:
    """Append trailing TIME-range windowed columns per key: each row sees
    every row of its key with ``order_col`` in ``[current - span,
    current]`` (inclusive both ends, Spark/SQL RANGE semantics — ties
    are peers regardless of physical order, so the result is
    deterministic under duplicate timestamps where a ROWS frame is not).

    The scale-safe form of ``RANGE BETWEEN <interval> PRECEDING``: the
    naive ``PARTITION BY key`` window caps parallelism at |keys| forever
    (3 symbols = 3 tasks at any corpus size). Here rows partition by
    (key, order DIV bucket) — parallel over keys x calendar buckets —
    and exactness is restored by CARRY: every row in the trailing
    ``span`` of a bucket is replicated into the NEXT calendar bucket
    (flagged, excluded from output), which is the complete set of
    foreign rows any frame in that bucket can reach because
    ``bucket >= span`` guarantees a frame spans at most one boundary.
    Carry lands in the next CALENDAR bucket, not the next populated
    one — a frame following an empty bucket correctly sees nothing.

    Carry volume is bounded by span/bucket of the data (e.g. 30 min
    carried per day ~ 2%); ``order_col`` must be numeric (epoch micros).
    """
    if bucket < span:
        raise ValueError(
            f"bucket ({bucket}) must be >= span ({span}): a frame may span "
            "at most one bucket boundary for the carry to be complete"
        )
    if span <= 0:
        raise ValueError("span must be positive")
    # FLOOR division in exact integer arithmetic: `x div b` truncates
    # toward zero, which for negative order values (pre-epoch
    # timestamps, signed offsets) would merge bucket -1 into bucket 0
    # and mis-place carry rows. Subtracting pmod first makes the
    # numerator an exact multiple of `bucket`, so `div` IS floor — no
    # double round-trip (epoch micros exceed a double's 2^53 exact
    # range by round numbers' luck only).
    d = df.withColumn(
        "__b",
        F.expr(
            f"(({order_col} - pmod({order_col}, {bucket})) div {bucket})"
        ).cast("long"),
    ).withColumn("__carry", F.lit(False))
    carry = (
        d.filter(
            F.col(order_col)
            >= (F.col("__b") + 1) * F.lit(bucket) - F.lit(span)
        )
        .withColumn("__b", F.col("__b") + 1)
        .withColumn("__carry", F.lit(True))
    )
    u = d.unionByName(carry)
    w = (
        W.partitionBy(*key_cols, "__b")
        .orderBy(order_col)
        .rangeBetween(-span, 0)
    )
    out = u.select("*", *[fn(w).alias(name) for name, fn in cols.items()])
    return out.filter(~F.col("__carry")).drop("__b", "__carry")
