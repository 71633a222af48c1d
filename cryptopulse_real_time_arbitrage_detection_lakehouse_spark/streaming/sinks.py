"""Streaming sinks (SURVEY.md K1-K3/K5 twins).

The reference's three jobs all end in a checkpointed Delta append sink;
delta-spark is not in this image, so the engine's durable sink is
checkpointed **parquet append** — same exactly-once contract (offsets +
commits WAL in the checkpoint, output files tracked in ``_spark_metadata``),
different table format. The lakehouse fallback (``sources/lakehouse``)
layers the version/history metadata on top.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


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


def drain(query: StreamingQuery, timeout_sec: int = 300) -> None:
    """Block until a bounded (availableNow) query finishes; surface errors."""
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise TimeoutError(f"streaming query did not drain within {timeout_sec}s")
    # awaitTermination swallows nothing: exception() is set on failure.
    err = query.exception()
    if err is not None:
        raise err
