"""Multi-level OLAP aggregation: ROLLUP / CUBE / GROUPING SETS.

The subtotal family every BI layer compiles to (reference
`src/dashboard/app.py` renders per-venue AND all-venue panels — two
grouping levels recomputed as two queries; these operators produce every
level in ONE pass). Spark plans all grouping sets with a single `Expand`
node: each input row is replicated once per grouping set with the
grouped-out columns nulled, then ONE hash aggregate runs over the union —
so an n-set rollup costs one scan + one shuffle of (rows x sets) partial
aggregates, not n separate jobs. Partial aggregation stays map-side
(Expand happens before the exchange), so at 100 TB the shuffle carries
|groups| x |sets| partial rows, not data.

Determinism: grouped-out VARCHAR cells are COALESCEd to the sentinel
'(all)' AFTER aggregation (the dimension values here are non-null, so the
sentinel cannot collide with data), and each row carries the engine's
grouping bit-vector — Spark `grouping_id()` and DuckDB `GROUPING(a, b)`
both put the FIRST grouping column in the most-significant bit, pinned by
the value hash. Double sums use the exact-decimal discipline
(`functions/determinism.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import davg, dsum, sql_davg, sql_dsum
from ..sources.testdata import load_table
from .registry import register


@register(
    "revenue_rollup_region_nation",
    oracle=f"""
SELECT
  COALESCE(r.r_name, '(all)') AS region,
  COALESCE(n.n_name, '(all)') AS nation,
  CAST(GROUPING(r.r_name, n.n_name) AS BIGINT) AS gid,
  count(*) AS n_orders,
  {sql_dsum("o.o_totalprice")} AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP(r.r_name, n.n_name)
""",
    doc="ROLLUP(region, nation) revenue: detail rows, per-region "
    "subtotals, and the grand total from ONE scan. Spark's Expand "
    "replicates each joined row 3x (one per rollup level) BEFORE the "
    "exchange, so map-side partial aggregation still collapses to "
    "|regions x nations| + |regions| + 1 partial rows per task — the "
    "shuffle is groups-sized at any SF. Dimension joins: nation/region "
    "broadcast (bounded), customer left to AQE. gid pins that both "
    "engines assign the first grouping column the most-significant "
    "grouping bit.",
    tags=("olap", "rollup", "aggregate", "join"),
)
def revenue_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    agg = joined.rollup("r_name", "n_name").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    return agg.select(
        F.coalesce("r_name", F.lit("(all)")).alias("region"),
        F.coalesce("n_name", F.lit("(all)")).alias("nation"),
        "gid",
        "n_orders",
        "revenue",
    )


@register(
    "order_priority_status_cube",
    oracle=f"""
SELECT
  COALESCE(o_orderpriority, '(all)') AS priority,
  COALESCE(o_orderstatus, '(all)') AS status,
  CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
  count(*) AS n_orders,
  {sql_dsum("o_totalprice")} AS revenue,
  {sql_davg("o_totalprice")} AS avg_price
FROM orders
GROUP BY CUBE(o_orderpriority, o_orderstatus)
""",
    doc="CUBE(priority, status): all four grouping sets — (p,s), (p), "
    "(s), () — in one pass. The cross-margin set (status alone) is what "
    "ROLLUP cannot produce and what the dashboard's independent filter "
    "dropdowns need. Expand factor 4 on a two-column projection of the "
    "fact; the aggregate output is bounded by the attribute domains "
    "(5 priorities x 3 statuses), so the reduce side is O(1) regardless "
    "of SF.",
    tags=("olap", "cube", "aggregate"),
)
def order_priority_status_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    agg = o.cube("o_orderpriority", "o_orderstatus").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
        davg("o_totalprice").alias("avg_price"),
    )
    return agg.select(
        F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
        F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
        "gid",
        "n_orders",
        "revenue",
        "avg_price",
    )


@register(
    "lineitem_grouping_sets_pricing",
    oracle=f"""
SELECT
  COALESCE(l_returnflag, '(all)') AS returnflag,
  COALESCE(l_linestatus, '(all)') AS linestatus,
  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
  count(*) AS n_items,
  {sql_dsum("l_quantity")} AS sum_qty,
  {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="Explicit GROUPING SETS — the asymmetric subtotal list neither "
    "ROLLUP nor CUBE expresses exactly: detail by (returnflag, "
    "linestatus), subtotal by returnflag, grand total — but NO "
    "linestatus-only margin (the set a CUBE would waste an Expand "
    "replica computing). Uses PySpark 4's DataFrame.groupingSets so the "
    "set list is declared, not compiled by hand from unions; the plan "
    "is the same single Expand + one hash aggregate.",
    tags=("olap", "grouping-sets", "aggregate"),
)
def lineitem_grouping_sets_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n_items"),
        dsum("l_quantity").alias("sum_qty"),
        dsum(revenue).alias("revenue"),
    )
    return agg.select(
        F.coalesce("l_returnflag", F.lit("(all)")).alias("returnflag"),
        F.coalesce("l_linestatus", F.lit("(all)")).alias("linestatus"),
        "gid",
        "n_items",
        "sum_qty",
        "revenue",
    )
