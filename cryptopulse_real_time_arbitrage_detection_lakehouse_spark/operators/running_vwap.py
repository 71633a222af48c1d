"""Anchored (running) VWAP per symbol: batch two-level rewrite + Spark 4
``transformWithStateInPandas`` streaming form.

The dashboard-side KPI math of the reference
(``/root/reference/src/dashboard/app.py:70-86``) and its mislabeled
``avg(price)`` "VWAP" (``/root/reference/src/jobs/gold_layer.py:67``)
motivate the real thing: for every tick, the volume-weighted average price
of ALL ticks of that symbol up to and including it —
``sum(price*size) / sum(size)`` over an unbounded-preceding frame.

Two forms, one semantics:

- `running_vwap` (batch, oracle-checked): the naive plan is a window over
  ``PARTITION BY symbol`` — with 3 symbols that stage has parallelism 3 at
  any cluster size (the ``candle_close_delta`` watch item from the round-1
  verdict). This uses the same two-level rewrite as
  `operators.chunked_lag`: exact-decimal running sums *within* (symbol,
  time-chunk) buckets run in parallel, per-chunk totals (one row per
  chunk) take the sequential prefix pass, and a broadcast join adds each
  chunk's prefix offset back. Decimal addition is associative, so
  chunk-local + offset is bit-identical to the single-partition window.
- `running_vwap_stream` (streaming): the cumulative (sum_pv, sum_v) pair
  is carried per symbol across micro-batches with the Spark 4 arbitrary
  stateful API (``transformWithStateInPandas`` + ``ValueState``) — the
  successor of ``applyInPandasWithState`` used by `operators.alerts`.
  State is two numbers per key, O(1) forever.

Float discipline (SURVEY.md section 7.4): batch terms go through
``decimal(25,10)`` so sums are order-independent; the final vwap divides
two exactly-summed doubles. The streaming form accumulates int128-exact
decimals via Python ints (scaled by 1e10) inside the processor for the
same reason — state crosses Arrow as paired doubles (quotient-safe for
the magnitudes here; documented bound below).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.determinism import SUM_DECIMAL

#: output schema of the streaming form (epoch-micros timestamps, as in
#: operators.alerts: tz-aware timestamps don't round-trip Arrow cleanly).
VWAP_STREAM_SCHEMA = (
    "symbol string, ts_us long, trade_id long, price double, size double, vwap double"
)
#: carried state: exact cumulative sums, scaled-integer-in-double encoding
#: (value * 1e10 stored as double — exact while |sum|*1e10 < 2^53, i.e.
#: cumulative pv below ~9e5; the testdata's per-symbol totals are ~1e5.
#: At production scale swap the encoding for a 2-double hi/lo split or a
#: binary-packed int128 — the processor shape is unchanged).
VWAP_STATE_SCHEMA = "pv_scaled double, v_scaled double"
_SCALE = 10_000_000_000  # 1e10 = decimal(_, 10) integer scaling


def running_vwap(
    ticks: DataFrame,
    *,
    chunk: Column | None = None,
) -> DataFrame:
    """Per-tick anchored VWAP, parallel over (symbol, time-chunk) buckets.

    ``chunk`` must be a monotone function of (trade_timestamp); default is
    the UTC day. Returns the input columns plus ``vwap``.
    """
    if chunk is None:
        chunk = F.floor(F.unix_micros(F.col("trade_timestamp")) / (86_400 * 1_000_000))
    pv = (F.col("price") * F.col("size")).cast(SUM_DECIMAL)
    v = F.col("size").cast(SUM_DECIMAL)

    d = ticks.withColumn("__chunk", chunk)
    w_local = (
        W.partitionBy("symbol", "__chunk")
        .orderBy("trade_timestamp", "trade_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_local_desc = W.partitionBy("symbol", "__chunk").orderBy(
        F.col("trade_timestamp").desc(), F.col("trade_id").desc()
    )
    # Running sums + last-row marker ride ONE (symbol, chunk) exchange;
    # the totals branch filters this same subtree, so the shuffle is
    # reused, not recomputed (same trick as chunked_lag).
    local = (
        d.withColumn("__run_pv", F.sum(pv).over(w_local))
        .withColumn("__run_v", F.sum(v).over(w_local))
        .withColumn("__rn_desc", F.row_number().over(w_local_desc))
    )

    # One row per (symbol, chunk): the chunk totals are the running sums at
    # the chunk's last row.
    totals = local.filter(F.col("__rn_desc") == 1).select(
        "symbol",
        "__chunk",
        F.col("__run_pv").alias("__tot_pv"),
        F.col("__run_v").alias("__tot_v"),
    )
    # Sequential prefix pass over the SUMMARY only (symbols x chunks rows):
    # everything strictly before this chunk.
    w_prefix = (
        W.partitionBy("symbol").orderBy("__chunk").rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "symbol",
        "__chunk",
        F.coalesce(F.sum("__tot_pv").over(w_prefix), F.lit(0).cast(SUM_DECIMAL)).alias(
            "__off_pv"
        ),
        F.coalesce(F.sum("__tot_v").over(w_prefix), F.lit(0).cast(SUM_DECIMAL)).alias(
            "__off_v"
        ),
    )

    out = local.join(F.broadcast(offsets), on=["symbol", "__chunk"]).withColumn(
        "vwap",
        (F.col("__off_pv") + F.col("__run_pv")).cast("double")
        / (F.col("__off_v") + F.col("__run_v")).cast("double"),
    )
    return out.drop("__chunk", "__run_pv", "__run_v", "__rn_desc", "__off_pv", "__off_v")


def _vwap_projection(ticks: DataFrame) -> DataFrame:
    """Narrow, Arrow-safe input for the stateful processor."""
    return ticks.select(
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
        F.col("price").cast("double").alias("price"),
        F.col("size").cast("double").alias("size"),
    )


def _make_vwap_kernel():
    """Per-batch kernel, nested so cloudpickle ships it by value (see
    operators.alerts._make_new_high_kernel). Pure pandas/ints — unit tests
    exercise the cross-batch state arithmetic without an engine.

    kernel(pdf, state) -> (out_pdf, state'), where state is the scaled
    integer pair (pv, v) or None for no history.
    """
    scale = _SCALE

    def kernel(
        pdf: pd.DataFrame, state: tuple[int, int] | None
    ) -> tuple[pd.DataFrame, tuple[int, int]]:
        pv, v = state if state is not None else (0, 0)
        pdf = pdf.sort_values(["ts_us", "trade_id"], ignore_index=True)
        vwaps = []
        for p, s in zip(pdf["price"], pdf["size"]):
            pv += round(p * s * scale)
            v += round(s * scale)
            vwaps.append((float(pv) / scale) / (float(v) / scale))
        out = pdf.copy()
        out["vwap"] = vwaps
        return out, (pv, v)

    return kernel


#: worker-shippable kernel instance shared by the processor and unit tests.
_vwap_kernel = _make_vwap_kernel()


def _make_vwap_processor():
    """Build the StatefulProcessor subclass INSIDE a factory so cloudpickle
    ships the class by value (module-level classes pickle by reference and
    workers may not be able to import this package)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    kernel = _vwap_kernel
    state_schema = VWAP_STATE_SCHEMA

    class RunningVwapProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cum = handle.getValueState("cum", state_schema)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            prior = self._cum.get() if self._cum.exists() else None
            state = (int(prior[0]), int(prior[1])) if prior else None
            for pdf in rows:
                out, state = kernel(pdf, state)
                yield out
            self._cum.update((float(state[0]), float(state[1])))

        def close(self) -> None:
            # required by the StatefulProcessor ABC; this processor holds
            # no resources outside the engine-managed state store
            pass

    return RunningVwapProcessor()


def transform_with_state_available() -> bool:
    """``transformWithStateInPandas`` moves state over a protobuf-framed
    socket protocol; the worker crashes at query start when
    ``google.protobuf`` is absent. Feature-gate, same policy as the Kafka
    connector gates in ``streaming/``."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_vwap_stream(ticks: DataFrame) -> DataFrame:
    """Streaming anchored VWAP: cumulative sums carried per symbol in
    ``ValueState`` across micro-batches (T3 family, Spark 4
    ``transformWithStateInPandas`` API).

    Raises RuntimeError at construction when the runtime lacks protobuf
    (required by the state-server protocol) so callers fail fast instead
    of crashing the driver worker at query start.
    """
    if not transform_with_state_available():
        raise RuntimeError(
            "transformWithStateInPandas requires google.protobuf, which this "
            "runtime does not provide; use operators.alerts-style "
            "applyInPandasWithState or run where protobuf is installed"
        )
    return (
        _vwap_projection(ticks)
        .groupBy("symbol")
        .transformWithStateInPandas(
            statefulProcessor=_make_vwap_processor(),
            outputStructType=VWAP_STREAM_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
