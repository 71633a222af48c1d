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


from ..functions.determinism import dsum as _dsum  # noqa: E402
from ..functions.determinism import sql_dsum as _sql_dsum  # noqa: E402
from ..operators.partitioning import write_bucketed  # noqa: E402


@register(
    "bucketed_join_audit",
    oracle=f"""
SELECT o.o_orderpriority, count(*) AS n,
       {_sql_dsum("l.l_extendedprice")} AS revenue,
       CAST(1 AS BIGINT) AS join_has_no_exchange,
       CAST(1 AS BIGINT) AS scan_is_bucketed
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
""",
    doc="Bucketed co-located fact-fact join behind a correctness row "
    "(X40 made driver-checkable): lineitem and orders are persisted as "
    "catalog tables hash-bucketed on their join key (8 buckets, one "
    "file per bucket), and the join plan is then AUDITED — with "
    "broadcast disabled it must be a SortMergeJoin with ZERO Exchange "
    "(bucket i zips with bucket i; the only surviving sort is the "
    "per-task in-memory one) over scans reporting 'Bucketed: true' "
    "with all 8 buckets selected. Both plan facts ride as flags next "
    "to the joined content, which the oracle recomputes from the raw "
    "tables — so green certifies the bucketed layout changed the PLAN "
    "without changing one row of the ANSWER. At 100 TB this is the "
    "pay-shuffle-once contract: two fact tables bucketed at write "
    "time join with zero network movement on every later query, the "
    "single biggest shuffle a warehouse saves.",
    tags=("join", "bucketing", "layout", "relational", "tpch"),
)
def bucketed_join_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    db = f"bkt_{_uuid.uuid4().hex[:10]}"
    loc = tempfile.mkdtemp(prefix="cpbkt_")
    spark.sql(f"CREATE DATABASE {db} LOCATION '{loc}'")
    write_bucketed(li, f"{db}.li_b", key="l_orderkey", buckets=8)
    write_bucketed(orders, f"{db}.orders_b", key="o_orderkey", buckets=8)
    a = spark.table(f"{db}.li_b")
    b = spark.table(f"{db}.orders_b")
    joined = a.join(b, a.l_orderkey == b.o_orderkey)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    no_exchange = int("SortMergeJoin" in plan and "Exchange" not in plan)
    bucketed = int(
        "Bucketed: true" in plan
        and plan.count("SelectedBucketsCount: 8 out of 8") == 2
    )
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        _dsum("l_extendedprice").alias("revenue"),
        F.lit(no_exchange).cast("long").alias("join_has_no_exchange"),
        F.lit(bucketed).cast("long").alias("scan_is_bucketed"),
    )
