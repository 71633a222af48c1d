"""Streaming sinks (SURVEY.md K1-K5 twins).

The reference's three jobs all end in a checkpointed Delta append sink;
delta-spark is not in this image, so the engine's durable sink is
checkpointed **parquet append** — same exactly-once contract (offsets +
commits WAL in the checkpoint, output files tracked in ``_spark_metadata``),
different table format. The lakehouse fallback (``sources/lakehouse``)
layers the version/history metadata on top.

The Kafka producer sink (K4, the outbound twin of the reference's
producer ``/root/reference/src/producers/main.py:46-55``) is split into a
testable envelope transform (`kafka_records`) and a start wrapper
(`start_kafka_stream`) that needs the spark-sql-kafka connector jar on
the classpath to actually run.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

#: stateful-drain shuffle width: every micro-batch commits one state-store
#: delta PER shuffle partition, so a bounded drain pays (partitions ×
#: batches) commit overheads regardless of data volume. The reference runs
#: its streaming jobs at 4 (``src/jobs/gold_layer.py:37``) for exactly this
#: reason; state volume per drain here is tiny, so 4 holds at any SF the
#: bench runs (an unbounded production stream would size this to state
#: volume / executor count instead — it is pinned per-checkpoint anyway).
STREAM_SHUFFLE_PARTITIONS = 4


#: re-entrancy guard: the combined audits (plans/combined.py) run member
#: queries from a thread pool, so two drains' scopes can overlap. Scopes
#: are tracked PER SESSION (a pooled member runs on its own cloned
#: session since r13, so cross-thread overlap mutates disjoint confs) as
#: a LIFO stack of saved priors: nested scopes with DIFFERENT widths
#: (n=4 drains nesting inside n=16 stateful ones, or vice versa) each
#: restore exactly the value they displaced — the r12 ref-count restored
#: only the outermost prior, leaving an inner scope's exit at the inner
#: width (r12 ADVICE).
_SCOPE_LOCK = threading.Lock()
_SCOPE_STATE: dict[tuple, list] = {}  # session key -> [saved prior, ...]


def _session_key(spark: SparkSession) -> tuple:
    # applicationId + JVM-session identity: cloned sessions share the
    # context but have their OWN SQLConf, so each needs its own stack.
    return (spark.sparkContext.applicationId, spark._jsparkSession.hashCode())


@contextmanager
def scoped_shuffle_partitions(spark: SparkSession, n: int = STREAM_SHUFFLE_PARTITIONS):
    """Temporarily set ``spark.sql.shuffle.partitions`` around a bounded
    stream start+drain. Streaming state partitioning is read from the
    session conf when the query's checkpoint is created — the fresh
    per-call checkpoints in `plans/streaming.py` make this scope exact —
    and the conf is restored for whatever batch work follows. Thread-safe
    via a per-session LIFO stack of saved priors."""
    key = "spark.sql.shuffle.partitions"
    skey = _session_key(spark)
    with _SCOPE_LOCK:
        stack = _SCOPE_STATE.setdefault(skey, [])
        stack.append(spark.conf.get(key))
        spark.conf.set(key, str(n))
    try:
        yield
    finally:
        with _SCOPE_LOCK:
            spark.conf.set(key, stack.pop())
            if not stack:
                _SCOPE_STATE.pop(skey, None)


def kafka_records(df: DataFrame, *, key: Column | str) -> DataFrame:
    """Any DataFrame -> Kafka producer records: binary ``key`` plus a
    binary ``value`` holding the row serialized with ``to_json`` (F8) —
    the reference producer's ``json.dumps(data)`` payload contract.

    Row-local (no shuffle); works on batch and streaming inputs, so the
    same transform feeds `start_kafka_stream` and the batch
    ``df.write.format("kafka")`` path.
    """
    key_col = F.col(key) if isinstance(key, str) else key
    payload_cols = [c for c in df.columns if c != (key if isinstance(key, str) else None)]
    return df.select(
        key_col.cast("string").cast("binary").alias("key"),
        F.to_json(F.struct(*payload_cols)).cast("binary").alias("value"),
    )


def start_kafka_stream(
    records: DataFrame,
    *,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    options: dict[str, str] | None = None,
) -> StreamingQuery:
    """Kafka producer sink (K4 twin). ``records`` must already be in
    key/value binary shape (use `kafka_records`).

    Requires the ``spark-sql-kafka-0-10`` connector jar (not in this
    image): construction is lazy, ``.start()`` raises without it — the
    in-image substitute is `start_parquet_stream` over the same records.
    """
    writer = (
        records.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    for k, v in (options or {}).items():
        writer = writer.option(k, v)
    return writer.start()


def start_parquet_stream(
    df: DataFrame,
    *,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """Checkpointed append-mode parquet sink (K1-K3 twin).

    ``available_now=True`` drains everything currently available and stops
    — the batch-equivalence trigger (T6); pass False for the reference's
    default ASAP micro-batch trigger. Parquet sinks are append-only, which
    is exactly the reference's output mode: windowed aggregations upstream
    must carry a watermark so finalized windows (and only those) emit.
    """
    writer = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_console_stream(
    df: DataFrame,
    *,
    num_rows: int = 20,
    truncate: bool = False,
    available_now: bool = True,
) -> StreamingQuery:
    """Console sink (K5 twin of the reference's ``.show`` diagnostics)."""
    writer = (
        df.writeStream.format("console")
        .outputMode("append")
        .option("numRows", str(num_rows))
        .option("truncate", str(truncate).lower())
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_delta_append_stream(
    df: DataFrame,
    *,
    table_path: str,
    checkpoint: str,
    app_id: str,
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """Append-mode stream into a Delta table with TRANSACTIONAL
    exactly-once: each micro-batch commits with a ``txn`` action keyed
    (``app_id``, batch_id), so a batch replayed after a crash between
    the Delta commit and the streaming checkpoint is detected IN THE LOG
    and skipped — delta-spark's streaming-sink protocol, which plain
    file sinks cannot offer (foreachBatch is at-least-once; idempotence
    must come from the sink). Contrast `start_merge_stream`, whose
    exactly-once relies on keyed-merge idempotence instead."""
    from ..sources.delta import DeltaTable

    table = DeltaTable(table_path)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.write(batch_df, mode="append", txn=(app_id, batch_id))

    writer = (
        df.writeStream.foreachBatch(commit)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_merge_stream(
    df: DataFrame,
    *,
    table_path: str,
    keys: tuple[str, ...],
    checkpoint: str,
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """Continuous upsert: update-mode stream -> ``foreachBatch`` -> Delta
    MERGE keyed by ``keys`` (``sources/delta.DeltaTable.merge``).

    This is the low-latency alternative to the reference's append-after-
    watermark gold sink (``gold_layer.py:83-92``): instead of emitting a
    window only once its watermark closes it, every micro-batch upserts
    the CURRENT value of each updated (window, symbol) row, so dashboards
    read live candles. Exactly-once table state comes from idempotence,
    not the WAL: a replayed batch re-merges the same keyed rows onto the
    same keys, leaving the table unchanged — the standard foreachBatch
    contract (Spark guarantees at-least-once for side-effecting sinks).

    ``df`` must be keyed-complete per batch: each emitted row carries the
    full new value for its key (true for windowed aggregations in update
    output mode).
    """
    from ..sources.delta import DeltaTable

    table = DeltaTable(table_path)

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if table.latest_version() is None:
            table.write(batch_df, mode="append")
        else:
            table.merge(batch_df, list(keys))

    writer = (
        df.writeStream.foreachBatch(commit)
        .outputMode("update")
        .option("checkpointLocation", checkpoint)
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain(query: StreamingQuery, timeout_sec: int = 300) -> None:
    """Block until a bounded (availableNow) query finishes; surface errors."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(f"streaming query did not drain within {timeout_sec}s")
    # awaitTermination swallows nothing: exception() is set on failure.
    err = query.exception()
    if err is not None:
        raise err
