"""Lakehouse metadata queries (SURVEY.md M2/M3 twins), oracle-checked.

``check_bronze.py:73-84`` audits a table by reading its Delta history
(version / operation / mode / row counts). Here the engine builds a
lakehouse table live — one commit per event_type batch, committed in
sorted order so version assignment is deterministic — then queries its
commit log. The DuckDB twin recomputes the same audit straight from
``events``, which checks both the log contents and the append machinery.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.lakehouse import LakehouseTable
from ..sources.testdata import load_table
from .registry import register

#: deterministic commit order for the audit table (one batch per type).
_BATCH_TYPES = ("click", "error", "purchase", "signup", "view")


def _build_audit_table(spark: SparkSession, sf_dir: str) -> LakehouseTable:
    events = load_table(spark, sf_dir, "events")
    table = LakehouseTable(tempfile.mkdtemp(prefix="cplake_") + "/events_by_type")
    for etype in _BATCH_TYPES:
        table.append(
            events.filter(F.col("event_type") == etype).select(
                "event_id", "ts", "user_id", "event_type", "value"
            )
        )
    return table


@register(
    "lakehouse_history_audit",
    oracle=f"""
SELECT CAST(row_number() OVER (ORDER BY event_type) - 1 AS BIGINT) AS version,
       'APPEND' AS operation,
       'Append' AS mode,
       count(*) AS num_output_rows
FROM events
WHERE event_type IN {_BATCH_TYPES!r}
GROUP BY event_type
""",
    doc="DeltaTable.history() twin (check_bronze.py:76-84): build a "
    "versioned parquet-lakehouse table with one commit per event_type, "
    "then audit its commit log — version, operation, mode, rows per "
    "commit. Timestamps excluded (non-deterministic).",
    tags=("lakehouse", "metadata", "history"),
)
def lakehouse_history_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _build_audit_table(spark, sf_dir)
    return table.history(spark).select(
        "version", "operation", "mode", "num_output_rows"
    )


@register(
    "lakehouse_time_travel_counts",
    oracle=f"""
SELECT event_type, count(*) AS n
FROM events
WHERE event_type IN {_BATCH_TYPES[:2]!r}
GROUP BY event_type
""",
    doc="Time-travel read (M2): the snapshot AS OF version 1 contains "
    "exactly the first two commits' rows; later commits are invisible. "
    "Version pruning happens at file listing — commits 2..4 are never "
    "scanned.",
    tags=("lakehouse", "metadata", "time-travel"),
)
def lakehouse_time_travel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _build_audit_table(spark, sf_dir)
    snapshot = table.read(spark, version=1)
    return snapshot.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


from ..operators.zorder import (  # noqa: E402
    sql_interleave,
    sql_scaled,
    with_zvalue,
)


@register(
    "lineitem_zorder_keys",
    oracle=f"""
WITH bounds AS (
  SELECT min(l_partkey) AS amin, max(l_partkey) AS amax,
         min(l_suppkey) AS bmin, max(l_suppkey) AS bmax
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {sql_interleave(sql_scaled('l_partkey', 'amin', 'amax'),
                       sql_scaled('l_suppkey', 'bmin', 'bmax'))} AS zval
FROM lineitem, bounds
""",
    doc="Normalized Morton (Z-order) codes for (l_partkey, l_suppkey) - "
    "the sort key behind `operators.zorder.zorder_write`, the engine's "
    "OPTIMIZE-ZORDER twin. Keys are affinely mapped onto a common 16-bit "
    "width from their global min/max before interleaving (asymmetric raw "
    "ranges would let one key's high bits dominate the range split, "
    "leaving the other un-clustered - measured, see operators/zorder.py), "
    "then clustering on the code gives every output file a small tile of "
    "the key plane, so per-file min/max stats prune scans filtered on "
    "EITHER column (verified against real parquet footers in "
    "tests/test_zorder.py). Pure integer arithmetic: exact, portable, "
    "whole-stage-codegen'd; the min/max pass is a broadcast single-row "
    "aggregate.",
    tags=("lakehouse", "zorder", "layout"),
)
def lineitem_zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
    )
    return with_zvalue(li, ("l_partkey", "l_suppkey"), out="zval")
