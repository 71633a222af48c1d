"""Scale-safe ``lag`` over few-distinct-key partitions.

``lag(x) OVER (PARTITION BY symbol ORDER BY ts)`` runs each symbol's whole
history through ONE task: with 3 symbols the stage has parallelism 3 no
matter how many executors exist (round-1 verdict watch item on
``candle_close_delta``). This operator restores parallelism with the
classic two-level rewrite:

1. bucket rows into (key, time-chunk); the heavy local ``lag`` runs per
   chunk — parallelism keys x chunks;
2. reduce each chunk to its LAST value (a tiny aggregate: one row per
   (key, chunk));
3. run the sequential pass only over that summary — a window over
   keys x chunks rows, thousands not billions — to find each chunk's
   predecessor tail across empty-chunk gaps;
4. broadcast-join the tails back and patch each chunk's first row, whose
   local lag is null.

Exactly the plain window's result (verified against the same oracle), but
the per-key serial stage now touches ~rows/chunks rows per task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def chunked_lag(
    df: DataFrame,
    *,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    chunk: Column,
    out_col: str = "lag_value",
    materialize: bool = False,
) -> DataFrame:
    """Append ``out_col`` = ``lag(value_col)`` within ``key_cols`` ordered
    by ``order_col``, parallel over ``chunk`` buckets.

    ``chunk`` must be a monotone function of ``order_col`` (e.g. the day of
    a timestamp): ordering by (chunk, order) must equal ordering by order.

    ``materialize=True`` cuts ``df``'s lineage with an EAGER
    ``localCheckpoint`` so the probe and tails branches share ONE
    computation of the input (Catalyst cannot reuse the exchange here —
    column pruning specializes each branch's subtree; a lazy checkpoint
    gives no reuse at all inside a single action, and ``persist()``
    pollutes the session CacheManager — see ``partitioning.shared``).
    Use it when ``df`` is itself an expensive aggregate that is small
    enough to hold in executor storage — e.g. a candle table (symbols x
    windows), exactly the table a production pipeline would have
    materialized anyway.
    """
    if materialize:
        df = df.localCheckpoint(eager=True)
    d = df.withColumn("__chunk", chunk)
    w_local = W.partitionBy(*key_cols, "__chunk").orderBy(order_col)
    # whole-partition frame (no orderBy): the count rides the SAME
    # exchange AND the same ascending sort as __lag/__rn — the previous
    # descending row_number forced a second per-partition Sort (guide
    # §2.4: operations keyed the same way should share one exchange; here
    # they also share one sort). "last row" is then __rn == __cnt.
    w_all = W.partitionBy(*key_cols, "__chunk")
    # __lag, __rn, __cnt all ride the SAME (key, chunk) exchange; the
    # tails branch below filters this very subtree, so Spark reuses the
    # shuffle instead of recomputing the upstream pipeline twice.
    local = (
        d.withColumn("__lag", F.lag(value_col).over(w_local))
        .withColumn("__rn", F.row_number().over(w_local))
        .withColumn("__cnt", F.count(F.lit(1)).over(w_all))
    )

    # one row per (key, chunk): the chunk's last value in order — extracted
    # from `local` (shared lineage), not recomputed from `df`
    tails = local.filter(F.col("__rn") == F.col("__cnt")).select(
        *key_cols, "__chunk", F.col(value_col).alias("__tail")
    )
    # sequential pass over the SUMMARY only: the previous non-empty
    # chunk's tail, correct across gaps
    w_tail = (
        W.partitionBy(*key_cols)
        .orderBy("__chunk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    prev_tails = tails.select(
        *key_cols,
        "__chunk",
        F.last("__tail").over(w_tail).alias("__prev_tail"),
    )

    out = local.join(
        F.broadcast(prev_tails), on=[*key_cols, "__chunk"], how="left"
    ).withColumn(
        out_col,
        F.when(F.col("__rn") == 1, F.col("__prev_tail")).otherwise(F.col("__lag")),
    )
    return out.drop("__chunk", "__lag", "__rn", "__cnt", "__prev_tail")
