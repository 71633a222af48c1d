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

__all__ = ["chunked_rolling"]


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
