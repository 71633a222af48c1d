"""In-flight audit metrics via ``df.observe`` (SURVEY.md K5/M-family).

The reference audits its tables after the fact with separate scan jobs
(``/root/reference/src/utils/check_data.py:23-39``: count, freshness,
sample). At 100 TB a second scan to count rows is a second pass over the
table; ``observe`` attaches accumulator-backed metrics to the SAME pass —
the audit rides the job that was running anyway, for free.

Batch: wrap the frame, run any action, read ``Observation.get``.
Streaming: the same named metrics surface per micro-batch in
``StreamingQueryProgress.observedMetrics[name]`` — the counters a
production medallion job exports to its monitoring system.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def observed(
    df: DataFrame, metrics: dict[str, Column]
) -> tuple[DataFrame, Observation]:
    """Attach named audit metrics to ``df``'s next execution.

    Returns the wrapped frame and the ``Observation`` handle;
    ``observation.get`` blocks until the first action on the wrapped
    frame completes and then yields ``{name: value}``. Metrics must be
    aggregate expressions (count/sum/min/max/...) — they are computed by
    accumulators inside the running tasks, adding no extra scan, no
    shuffle, and no action of their own.
    """
    obs = Observation()
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(obs, *named), obs


def ingest_audit_metrics(
    ts_col: str = "trade_timestamp", key_col: str = "symbol"
) -> dict[str, Column]:
    """The standard medallion ingest audit: volume, null-key volume, and
    event-time freshness bounds — the engine-side twin of the
    reference's check_data count + max(ingest_ts) queries. ``key_col``
    names the frame's key column for the null check (frames without a
    'symbol' column pass their own, e.g. ``key_col='user_id'``)."""
    return {
        "n_rows": F.count(F.lit(1)),
        "n_null_keys": F.count(F.when(F.col(key_col).isNull(), 1)),
        "max_event_ts": F.max(ts_col),
        "min_event_ts": F.min(ts_col),
    }


def observe_stream(df: DataFrame, name: str, metrics: dict[str, Column]) -> DataFrame:
    """Streaming variant: attach named metrics to a streaming frame; each
    micro-batch's values appear in ``progress.observedMetrics[name]``."""
    named = [c.alias(n) for n, c in metrics.items()]
    return df.observe(name, *named)
