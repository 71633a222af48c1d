"""Stateful alert operators: per-key running-extreme detection.

"Emit a row when a symbol prints a price strictly above every price it has
printed before" is the simplest member of the anchor/threshold alert
family the reference's dashboard approximates client-side
(``/root/reference/src/dashboard/app.py:70-86``). It is inherently
*sequential per key* — each decision depends on the running maximum of
everything earlier — so the streaming form is a custom stateful operator
(``applyInPandasWithState``: state = one double per symbol, carried across
micro-batches), not a windowed aggregation.

One Arrow-vectorized kernel (`_new_high_kernel`, NumPy running max — no
per-row Python) is shared by:

- `new_high_alerts` (batch): ``groupBy(symbol).applyInPandas`` — the
  driver-oracle-checked form (DuckDB twin: running-max window + lag).
- `new_high_alerts_stream` (streaming): ``applyInPandasWithState`` in
  append mode; the state tuple is the running high, so memory is O(1) per
  key forever — the property that distinguishes this from buffering
  operators.

Scale notes: parallelism is bounded by distinct keys (inherent — the
running max is a total order per key, same constraint as any per-key
stateful operator); state is 8 bytes per key; alert output is ~O(log n)
rows per key for exchangeable inputs, so the sink side is tiny.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: output schema shared by the batch and streaming forms. Timestamps
#: travel as epoch micros (see functions.determinism.fmt_ts rationale).
ALERT_SCHEMA = (
    "symbol string, ts_us long, trade_id long, price double, prev_high double"
)
STATE_SCHEMA = "high double"


def _make_new_high_kernel():
    """Build the per-key kernel as a NESTED function so cloudpickle ships
    it to Python workers BY VALUE: a module-level function would pickle by
    reference (module + qualname), and the workers of a driver process
    that merely ``sys.path``-injected this repo cannot import the package.
    Third-party globals (numpy/pandas) still pickle by reference — those
    the workers do have."""

    def kernel(pdf: pd.DataFrame, high0: float | None) -> tuple[pd.DataFrame, float]:
        """Alert rows + updated running high for ONE key's sorted rows.

        ``high0`` is the carried state (None = no prior history; the first
        row then seeds the high and is NOT an alert — a new high must beat
        an existing one).
        """
        pdf = pdf.sort_values(["ts_us", "trade_id"], ignore_index=True)
        prices = pdf["price"].to_numpy(dtype=np.float64)
        seed = -np.inf if high0 is None else high0
        run = np.maximum.accumulate(np.concatenate(([seed], prices)))
        prev = run[:-1]  # running high BEFORE each row
        mask = (prices > prev) & np.isfinite(prev)
        out = pdf.loc[mask, ["symbol", "ts_us", "trade_id", "price"]].copy()
        out["prev_high"] = prev[mask]
        return out, float(run[-1])

    return kernel


#: worker-shippable kernel instance (see factory docstring); unit tests
#: and both operator forms share this one object.
_new_high_kernel = _make_new_high_kernel()


def _alert_projection(ticks: DataFrame) -> DataFrame:
    """Narrow, type-stable input for the pandas kernel (double price,
    epoch-micros time — no decimals or tz-aware timestamps cross Arrow)."""
    return ticks.select(
        "symbol",
        F.unix_micros(F.col("trade_timestamp")).alias("ts_us"),
        "trade_id",
        F.col("price").cast("double").alias("price"),
    )


def new_high_alerts(ticks: DataFrame) -> DataFrame:
    """Batch form: all new-high alert rows per symbol."""

    def apply(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _new_high_kernel(pdf, None)
        return out

    return (
        _alert_projection(ticks).groupBy("symbol").applyInPandas(apply, ALERT_SCHEMA)
    )


def new_high_alerts_stream(ticks: DataFrame) -> DataFrame:
    """Streaming form: same kernel with the running high carried in group
    state across micro-batches (T3 family, custom-stateful flavor)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def apply(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        high = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs), ignore_index=True)
        out, high = _new_high_kernel(batch, high)
        state.update((high,))
        yield out

    return (
        _alert_projection(ticks)
        .groupBy("symbol")
        .applyInPandasWithState(
            apply,
            ALERT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
