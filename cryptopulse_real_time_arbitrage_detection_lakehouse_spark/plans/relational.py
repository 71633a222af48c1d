"""Relational operator coverage over the TPC-H-ish star schema.

The reference implements zero joins (SURVEY.md section 2.6 — its headline
"arbitrage detection" capability needs them); this module provides the
full join/set-op/agg surface as oracle-checked queries, scale-aware:
dimension joins are broadcast, fact-fact joins shuffle on their keys with
AQE handling skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.determinism import davg, dsum, sql_davg, sql_dsum
from ..operators.partitioning import shared, spread
from ..sources.testdata import load_table
from .registry import register


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
SELECT
  l_returnflag, l_linestatus,
  {sql_dsum("l_quantity")} AS sum_qty,
  {sql_dsum("l_extendedprice")} AS sum_base_price,
  {sql_dsum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
  {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
  {sql_davg("l_quantity")} AS avg_qty,
  {sql_davg("l_extendedprice")} AS avg_price,
  {sql_davg("l_discount")} AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1-style pricing summary: scan + filter + 2-key groupBy with "
    "8 aggregates. One shuffle; partial agg map-side (SURVEY.md A1 family).",
    tags=("relational", "aggregate"),
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # r12: the exact-decimal sums are BigDecimal-backed (sum buffer
    # decimal(35,10) exceeds the long-backed 18-digit fast path), which
    # makes the partial aggregation the dominant per-task cost — 1.55 s
    # single-task vs 0.36 s for plain double sums at sf0.1. `spread`
    # widens the scan to cluster parallelism ONLY when the input arrives
    # narrower (the sf0.1 file is one row group -> one task); at 100 TB
    # the scan is already wide and no exchange is added (guide §1.2:
    # per-task work, parallelised scale-adaptively). Measured 1.55 ->
    # 0.76 s for the agg stage.
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    ).select(
        "l_returnflag", "l_linestatus", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax",
    )
    return (
        spread(filtered)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "revenue_by_nation",
    oracle=f"""
SELECT n.n_name AS nation,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       count(*) AS n_lineitems
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    doc="Multi-way equi-join (fact-fact shuffle join + broadcast dim joins) "
    "with revenue aggregation (SURVEY.md section 2.6 planned ops).",
    tags=("relational", "join", "aggregate"),
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # customer scales with SF — no forced broadcast (a hint pinned here
    # would OOM at 100x); AQE's join-strategy switching broadcasts it at
    # small SF anyway. nation is bounded (25 rows) so its hint is safe.
    # (r12: a spread() here was measured to NOT pay — one dsum's
    # BigDecimal load ~0.2 s vs the added exchange ~0.3 s; q1 keeps its
    # spread because it carries SEVEN decimal aggregates.)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(revenue).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "nations_per_region",
    oracle="""
SELECT r.r_name AS region, count(*) AS n_nations
FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""",
    doc="Broadcast equi-join of two dimensions (SURVEY.md 2.6: small-dim "
    "joins go broadcast — no shuffle of the probe side).",
    tags=("relational", "join", "broadcast"),
)
def nations_per_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count(F.lit(1)).alias("n_nations"))
    )


@register(
    "customers_with_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
    doc="Left-semi join: customers having at least one order (SURVEY.md 2.6).",
    tags=("relational", "join", "semi"),
)
def customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "customers_without_orders",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate < TIMESTAMP '1995-07-01 00:00:00')
""",
    doc="Left-anti join: customers with no orders in the first half of "
    "1995 (date-restricted so the result is non-trivially non-empty — "
    "SURVEY.md 2.6).",
    tags=("relational", "join", "anti"),
)
def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    early = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp")
    )
    return customer.join(
        early, customer.c_custkey == early.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "top_parts_by_revenue",
    oracle=f"""
SELECT p.p_partkey, p.p_name,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_partkey, p.p_name
ORDER BY revenue DESC, p_partkey ASC
LIMIT 25
""",
    doc="Join + agg + deterministic top-k (TakeOrderedAndProject, no global "
    "sort materialization — SURVEY.md O1 family at fact scale).",
    tags=("relational", "join", "topk"),
)
def top_parts_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # part scales with SF: leave the join strategy to AQE (see
    # revenue_by_nation note).
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(25)
    )


@register(
    "customer_order_profile",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       COALESCE(o.n_orders, 0) AS n_orders,
       COALESCE(o.total_spent, 0.0) AS total_spent
FROM customer c
LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders,
         {sql_dsum("o_totalprice")} AS total_spent
  FROM orders GROUP BY o_custkey
) o ON c.c_custkey = o.o_custkey
""",
    doc="Left-outer join with aggregate-before-join: order counts and spend "
    "per customer, zeros for order-less customers. Pre-aggregating orders "
    "to one row per custkey BEFORE the join keeps the outer join's build "
    "side at |customers| rows instead of |orders| — at 100 TB the join "
    "input shrinks by the per-customer order fan-out and the outer join "
    "shuffles two key-partitioned inputs of comparable size.",
    tags=("relational", "join", "outer"),
)
def customer_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("total_spent"),
        )
    )
    return customer.join(
        per_cust, customer.c_custkey == per_cust.o_custkey, "left"
    ).select(
        "c_custkey",
        "c_name",
        F.coalesce(F.col("n_orders"), F.lit(0)).alias("n_orders"),
        F.coalesce(F.col("total_spent"), F.lit(0.0)).alias("total_spent"),
    )


@register(
    "tpch_q3_top_urgent_orders",
    oracle=f"""
SELECT l.l_orderkey,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_orderpriority AS orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    doc="TPC-H Q3-style shipping-priority query: selective dimension filter "
    "(market segment) reduces customer BEFORE the join chain, date "
    "predicates push into the orders/lineitem scans (PushedFilters), one "
    "grouped aggregation, deterministic top-10 via TakeOrderedAndProject. "
    "The orders-lineitem join shuffles on orderkey; the filtered customer "
    "side is broadcast by AQE when it fits.",
    tags=("relational", "join", "topk"),
)
def tpch_q3_top_urgent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-03-15 00:00:00").cast("timestamp")
    customer = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "nation_market_balance",
    oracle="""
SELECT COALESCE(c.c_nationkey, s.s_nationkey) AS nationkey,
       COALESCE(c.n_rich_customers, 0) AS n_rich_customers,
       COALESCE(s.n_rich_suppliers, 0) AS n_rich_suppliers
FROM (
  SELECT c_nationkey, count(*) AS n_rich_customers
  FROM customer WHERE c_acctbal > 9000 GROUP BY c_nationkey
) c
FULL OUTER JOIN (
  SELECT s_nationkey, count(*) AS n_rich_suppliers
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey
) s ON c.c_nationkey = s.s_nationkey
""",
    doc="Full-outer join of two pre-aggregated sides: high-balance customer "
    "vs supplier counts per nation, keeping nations present on only one "
    "side (the acctbal filters make single-sided nations non-trivial). "
    "Aggregate-before-join bounds both inputs at 25 rows regardless of "
    "SF; the full-outer coalesce pattern is the standard reconciliation "
    "operator missing from plain inner/semi coverage.",
    tags=("relational", "join", "outer"),
)
def nation_market_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    rich_cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_rich_customers"))
    )
    rich_supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_rich_suppliers"))
    )
    return rich_cust.join(
        rich_supp, rich_cust.c_nationkey == rich_supp.s_nationkey, "full_outer"
    ).select(
        F.coalesce(F.col("c_nationkey"), F.col("s_nationkey")).alias("nationkey"),
        F.coalesce(F.col("n_rich_customers"), F.lit(0)).alias("n_rich_customers"),
        F.coalesce(F.col("n_rich_suppliers"), F.lit(0)).alias("n_rich_suppliers"),
    )


@register(
    "top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, order_rank FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS order_rank
  FROM orders
) r WHERE order_rank <= 3
""",
    doc="Top-N per group: each customer's three largest orders via a "
    "per-partition row_number rank — the grouped-top-k pattern distinct "
    "from global top-k (TakeOrderedAndProject). Partitioned by customer "
    "(high cardinality), so one hash shuffle and full parallelism; the "
    "deterministic orderkey tiebreak makes rank stable under ties.",
    tags=("relational", "window-function", "topk"),
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            # long, not Spark's int32 row_number: the driver compare is
            # dtype-strict and DuckDB row_number() is BIGINT
            F.row_number().over(w).cast("long").alias("order_rank"),
        )
        .filter(F.col("order_rank") <= 3)
    )


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue,
       count(*) AS n_lineitems
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6-style forecast revenue: a pure scan-filter-aggregate "
    "with four predicates that must ALL reach the parquet scan "
    "(PushedFilters) — the canonical pushdown benchmark. No join, no "
    "groupBy key: one map-side partial sum and a single-row final "
    "aggregate; at 100 TB the cost is exactly the pruned scan.",
    tags=("relational", "aggregate", "pushdown"),
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )

@register(
    "tpch_q4_priority_check",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4-style order-priority check (adapted: the testdata has no "
    "l_commitdate/l_receiptdate, so the correlated predicate is 'shipped "
    "strictly after the order date'). The correlated EXISTS becomes a "
    "LEFT SEMI join whose condition mixes the equi key with a per-pair "
    "inequality: Spark plans the equi part as the shuffle key and applies "
    "the inequality as a join residual, so the semi join stays a hash "
    "join — no nested loop. One shuffle on orderkey, then a tiny "
    "5-group aggregate.",
    tags=("relational", "semi-join", "aggregate"),
)
def tpch_q4_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    shipped_late = o.join(
        li,
        (o["o_orderkey"] == li["l_orderkey"]) & (li["l_shipdate"] > o["o_orderdate"]),
        "left_semi",
    )
    return shipped_late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@register(
    "tpch_q13_order_histogram",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
    doc="TPC-H Q13-style customer order-count distribution: LEFT OUTER "
    "join with a pushed non-key predicate (urgent orders excluded on the "
    "join condition, NOT as a pre-filter of customers — customers with "
    "only urgent orders must still appear with c_count=0), per-customer "
    "count(o_orderkey) (nulls from the outer join don't count), then a "
    "second aggregation into the histogram. Two shuffles: custkey join + "
    "tiny c_count regroup. The outer-join-then-double-agg shape is the "
    "classic distribution query.",
    tags=("relational", "outer-join", "aggregate"),
)
def tpch_q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (c["c_custkey"] == o["o_custkey"])
            & (o["o_orderpriority"] != "1-URGENT"),
            "left",
        )
        .groupBy(c["c_custkey"])
        .agg(F.count(o["o_orderkey"]).alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q17_small_qty_revenue",
    oracle=f"""
WITH part_avg AS (
  SELECT l_partkey AS pk, {sql_davg("l_quantity")} AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT p.p_brand,
       {sql_dsum("l.l_extendedprice")} AS small_qty_revenue,
       count(*) AS n_small
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.pk = l.l_partkey
WHERE p.p_brand IN ('Brand#12', 'Brand#23', 'Brand#34')
  AND l.l_quantity < 0.5 * a.avg_qty
GROUP BY p.p_brand
""",
    doc="TPC-H Q17-style small-quantity revenue: the scalar correlated "
    "subquery (per-part average quantity) becomes an aggregate-then-join "
    "— lineitem is aggregated once on l_partkey and joined back on the "
    "same key, so the aggregate and the join share one partitioning and "
    "AQE coalesces them; part is a broadcast dim. The float threshold "
    "uses the davg discipline so the 0.5*avg comparison is bit-identical "
    "in both engines.",
    tags=("relational", "aggregate", "join"),
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity").alias("avg_qty")
    )
    brands = part.filter(
        F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
    ).select("p_partkey", "p_brand")
    return (
        li.join(brands, li["l_partkey"] == brands["p_partkey"])
        .join(part_avg, li["l_partkey"] == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .groupBy("p_brand")
        .agg(
            dsum("l_extendedprice").alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "tpch_q5_local_supplier_revenue",
    oracle=f"""
SELECT n.n_name AS nation,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY 1
""",
    doc="TPC-H Q5-style local-supplier revenue: the 6-table join. The "
    "distinguishing constraint is c_nationkey = s_nationkey (customer and "
    "supplier in the SAME nation), which rides the lineitem-supplier join "
    "as a residual after the customer chain. Join order matters at scale: "
    "the date filter prunes orders at the scan, lineitem shuffles once on "
    "orderkey and once on suppkey; nation/region (and supplier at this "
    "SF) broadcast via AQE - no forced hints, so a grown supplier side "
    "degrades to a shuffle join instead of OOMing the driver.",
    tags=("relational", "join", "tpch"),
)
def tpch_q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", "n_name"
    )
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .join(
            sup,
            (li["l_suppkey"] == sup["s_suppkey"])
            & (cust["c_nationkey"] == sup["s_nationkey"]),
        )
        .join(nat, sup["s_nationkey"] == nat["n_nationkey"])
        .join(reg, nat["n_regionkey"] == reg["r_regionkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q18_large_volume_orders",
    oracle=f"""
WITH big AS (
  SELECT l_orderkey, {sql_dsum("l_quantity")} AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING {sql_dsum("l_quantity")} > 300
)
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
       o.o_totalprice AS totalprice, b.sum_qty
FROM big b
JOIN orders o ON o.o_orderkey = b.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
ORDER BY totalprice DESC, o_orderkey ASC
LIMIT 100
""",
    doc="TPC-H Q18-style large-volume orders: HAVING sum(l_quantity) > 300 "
    "as an aggregate-then-filter, joined to orders and customer. The "
    "per-order quantity total IS the output column, so lineitem is "
    "aggregated exactly once (one orderkey shuffle) instead of the naive "
    "IN-subquery + re-join double scan; the surviving ~1e-3 of orders "
    "make both downstream joins broadcast-able under AQE. Deterministic "
    "top-100 via sort on (totalprice desc, orderkey).",
    tags=("relational", "join", "tpch"),
)
def tpch_q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    ords = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(ords, big["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            "sum_qty",
        )
        .orderBy(F.col("totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "tpch_q22_idle_customer_balance",
    oracle=f"""
WITH avg_bal AS (
  SELECT {sql_davg("c_acctbal")} AS a FROM customer WHERE c_acctbal > 0
)
SELECT c.c_nationkey, count(*) AS numcust, {sql_dsum("c.c_acctbal")} AS totacctbal
FROM customer c, avg_bal
WHERE c.c_acctbal > avg_bal.a
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22-style idle-customer balance (adapted: the testdata "
    "schema has no c_phone, so grouping is by nation; and customers with "
    "zero orders carry NULL balances in the generated data, so 'idle' "
    "means no orders SINCE 2000 — the official query's 7-year dormancy "
    "window): customers with above-average positive balance and no "
    "recent orders — a scalar aggregate subquery (computed once, "
    "broadcast into the filter as a 1-row cross join) followed by a "
    "left_anti join against date-filtered orders (the date pushes to "
    "the orders scan) and a grouped count/sum. The anti join shuffles "
    "on custkey; the scalar avg goes through the exact-decimal "
    "discipline so the boundary comparison picks identical rows in "
    "both engines.",
    tags=("relational", "join", "anti-join", "tpch"),
)
def tpch_q22_idle_customer_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ords = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        davg("c_acctbal").alias("a")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(ords, cust["c_custkey"] == ords["o_custkey"], "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q7-style cross-nation volume shipping: lineitem joins both "
    "its supplier's nation and (via orders->customer) its customer's "
    "nation, keeping only the two directed pairs between two named "
    "nations. The disjunctive pair predicate runs AFTER the joins as a "
    "residual, but each side's nation filter is pushed into the "
    "broadcast nation dims, so only ~2/25 of suppliers and customers "
    "survive into the fact joins. Two fact shuffles (orderkey, then "
    "custkey/suppkey resolved via broadcast); year extraction is "
    "group-key only. Reference cite: arbitrage venue-pair comparison "
    "(SURVEY.md section 2.6) generalized to the TPC-H shape.",
    tags=("relational", "join", "tpch"),
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cn = nat.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    oracle=f"""
WITH all_nations AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  JOIN part p ON l.l_partkey = p.p_partkey
  WHERE r.r_name = 'AMERICA'
    AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
SELECT o_year,
       ({sql_dsum("CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END")}
        / {sql_dsum("volume")}) AS mkt_share
FROM all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8-style national market share: a 7-table join narrowed by "
    "region (customer side) and part type, then a conditional-aggregate "
    "ratio — share of volume supplied by one nation per order year. The "
    "numerator is a CASE inside the same dsum as the denominator, so one "
    "aggregation pass produces both and the ratio divides two exact-"
    "decimal-derived doubles (bit-identical across engines). Part is the "
    "selective dim: p_type prunes ~5/6 of lineitem before the orders "
    "shuffle under AQE's join reordering.",
    tags=("relational", "join", "aggregate", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nat.join(
        F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]
    ).select(F.col("n_nationkey").alias("cn_key"))
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = nat.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part scales with SF — no pinned broadcast (would OOM executors at
        # 100x); AQE join-strategy switching broadcasts it while it fits.
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(F.lit(0)))
                / dsum(volume)
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    oracle=f"""
SELECT sn.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9-style product-type profit (adapted: the testdata schema "
    "has no partsupp/ps_supplycost, so profit is discounted revenue): "
    "lineitem filtered through a LIKE-substring part dim, joined to "
    "supplier nation and order year, grouped by (nation, year) — a "
    "two-fact-shuffle plan where the part filter cannot push to the "
    "scan (substring match) but prunes before any shuffle via the "
    "broadcast hash join. 25 nations x 7 years keeps the final agg tiny.",
    tags=("relational", "join", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    ).select("p_partkey")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey"), F.col("n_name").alias("nation")
    )
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        # part scales with SF — no pinned broadcast (would OOM executors at
        # 100x); AQE join-strategy switching broadcasts it while it fits.
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(sup, li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
    )


@register(
    "tpch_q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       c.c_acctbal, n.n_name AS nation
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10-style returned-item report: quarter-filtered orders join "
    "return-flagged lineitems, grouped per customer with nation dim, "
    "top-20 by lost revenue. Both fact filters (date range, returnflag) "
    "push to the parquet scans; the join shuffles on orderkey then "
    "custkey; the final TakeOrderedAndProject moves only 20 rows per "
    "partition to the driver. Deterministic tiebreak on custkey.",
    tags=("relational", "join", "top-k", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    ords = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nat = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation")
    )
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .join(cust, ords["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nat), cust["c_nationkey"] == nat["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "nation")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "tpch_q14_promo_revenue",
    oracle=f"""
SELECT (100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END")}
        / {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")}) AS promo_revenue_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
""",
    doc="TPC-H Q14-style promo revenue share: one month of lineitem joined "
    "to part, conditional-aggregate percentage in a single ungrouped "
    "pass. The date filter pushes to the scan (min/max row-group "
    "skipping at scale); part broadcasts; numerator and denominator "
    "come out of the same partial-aggregate pipeline so the whole query "
    "is scan -> broadcast join -> one-row agg with no wide shuffle.",
    tags=("relational", "aggregate", "tpch"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        # part scales with SF — no pinned broadcast (would OOM executors at
        # 100x); AQE join-strategy switching broadcasts it while it fits.
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15-style top supplier: a quarter's per-supplier revenue "
    "(the TPC-H view) with the scalar-max subquery evaluated as a "
    "scalar AGGREGATE broadcast-cross-joined back onto the per-supplier "
    "frame — the max reduces map-side with no single-partition window "
    "stage, so the shape survives 100× more suppliers (a global "
    "`max().over()` would funnel the whole aggregate through one task). "
    "Both references derive from the SAME revenue⋈supplier subtree so "
    "Catalyst's ReuseExchange collapses them to one lineitem "
    "scan+shuffle (joining before the max keeps the pushed-down "
    "isnotnull filters identical across branches — the max-over-revenue "
    "vs max-over-join distinction is vacuous under TPC-H FK integrity, "
    "which the oracle's schema also guarantees). Revenue equality is "
    "safe across engines because dsum makes both sides' doubles "
    "bit-identical.",
    tags=("relational", "join", "aggregate", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    joined = revenue.join(sup, F.col("supplier_no") == F.col("s_suppkey"))
    max_rev = joined.agg(F.max("total_revenue").alias("mr"))
    return (
        joined.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("mr"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    oracle=f"""
SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
       count(*) AS n_matched
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5  AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10 AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity BETWEEN 20 AND 30)
""",
    doc="TPC-H Q19-style disjunctive predicate revenue: an OR of three "
    "conjunctive clauses mixing part attributes (brand, size) with "
    "lineitem attributes (quantity). Catalyst extracts the common "
    "per-side implications — part rows outside all three brands and "
    "lineitem rows outside quantity [1,30] are dropped BEFORE the join "
    "(visible as pushed scan filters) — and evaluates the full "
    "disjunction as a join residual. Single scalar output row.",
    tags=("relational", "join", "pushdown", "tpch"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    # part scales with SF — unhinted; AQE broadcasts it only while it fits.
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(clause).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n_matched"),
    )


@register(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
), eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name AS nation
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), ranked AS (
  SELECT eu.s_acctbal, eu.s_name, eu.nation, p.p_partkey, p.p_name,
         c.unit_cost,
         min(c.unit_cost) OVER (PARTITION BY c.l_partkey) AS min_cost
  FROM cost c
  JOIN eu ON c.l_suppkey = eu.s_suppkey
  JOIN part p ON p.p_partkey = c.l_partkey AND p.p_type = 'SMALL'
)
SELECT s_acctbal, s_name, nation, p_partkey, p_name, unit_cost
FROM ranked WHERE unit_cost = min_cost
ORDER BY s_acctbal DESC, nation, s_name, p_partkey
LIMIT 100
""",
    doc="TPC-H Q2-style minimum-cost supplier (adapted: the testdata schema "
    "has no partsupp, so the supply-cost relation is derived from lineitem "
    "as the minimum observed unit price per (part, supplier) pair): for "
    "SMALL-type parts, find the EUROPE supplier(s) matching the per-part "
    "minimum cost. The correlated min subquery becomes a window min over "
    "the part key — the derived cost relation is aggregated and windowed "
    "on the SAME key, so one shuffle serves both (no re-scan, unlike the "
    "view-twice formulation). Supplier/nation/region fold to a broadcast "
    "dim; top-100 via TakeOrderedAndProject with a full tiebreak chain. "
    "min() of per-row double division is order-independent, so the "
    "equality filter picks identical rows in both engines. Reference "
    "cite: SURVEY.md section 2.6 (joins absent from the reference).",
    tags=("relational", "join", "window", "tpch"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name").alias("nation"))
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "SMALL").select(
        "p_partkey", "p_name"
    )
    ranked = (
        # eu (supplier subset) and the SMALL-part subset both scale with SF
        # — unhinted; AQE broadcasts them only while they fit.
        cost.join(eu, cost["l_suppkey"] == eu["s_suppkey"])
        .join(part, cost["l_partkey"] == part["p_partkey"])
        .withColumn("min_cost", F.min("unit_cost").over(W.partitionBy("l_partkey")))
    )
    return (
        ranked.filter(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "nation", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("nation").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


@register(
    "tpch_q11_important_parts",
    oracle=f"""
WITH v AS (
  SELECT l.l_partkey,
         {sql_dsum("l.l_extendedprice * l.l_quantity", scale=4)} AS part_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey, part_value
FROM v, (SELECT {sql_davg("part_value", scale=4)} AS avg_value FROM v) t
WHERE part_value > 1.5 * avg_value
""",
    doc="TPC-H Q11-style important stock (adapted: no partsupp, so the "
    "per-part 'value' is extendedprice*quantity summed over one nation's "
    "suppliers' lineitems; the official query's fixed global fraction is "
    "replaced by 1.5x the per-part average, which stays meaningful at "
    "any SF): a grouped aggregate compared against a scalar aggregate of "
    "itself. The scalar is computed from the SAME aggregated frame and "
    "broadcast back as a 1-row cross join — lineitem is scanned and "
    "shuffled once, and the threshold comparison divides exact-decimal "
    "doubles so both engines pick identical survivors.",
    tags=("relational", "aggregate", "scalar-subquery", "tpch"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_sup = sup.join(
        F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"]
    ).select("s_suppkey")
    # shared(): the aggregated frame feeds both the scalar average and the
    # threshold filter — materialize it once instead of scanning lineitem
    # per branch (it is a per-part reduction, safe to cache at any SF).
    v = shared(
        li.join(nat_sup, li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        # price*quantity terms reach ~5e6, where a double ulp exceeds the
        # default scale-10 half-step — round at scale 4 (see determinism.py).
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_quantity"), scale=4).alias(
                "part_value"
            )
        )
    )
    # part_value carries at most 4 decimals and sits at ~1e6 magnitude, so
    # its re-round for the scalar average must also stay at scale 4.
    avg_v = v.agg(davg("part_value", scale=4).alias("avg_value"))
    return (
        v.crossJoin(F.broadcast(avg_v))
        .filter(F.col("part_value") > 1.5 * F.col("avg_value"))
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q12_shipmode_priority",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       count(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS high_line_count,
       count(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                  THEN 1 END) AS low_line_count
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
""",
    doc="TPC-H Q12-style shipping priority classes (adapted: the testdata "
    "schema has no l_shipmode, so the return flag plays the mode class): "
    "a year of lineitem joined to orders, with the order-priority split "
    "folded into two conditional counts in one aggregation pass. The "
    "date range pushes to the lineitem scan; one orderkey shuffle joins "
    "the facts; the 3-group conditional-count agg is all map-side "
    "partials. Counts are integer-exact — no float discipline needed.",
    tags=("relational", "join", "aggregate", "tpch"),
)
def tpch_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    ords = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q16_supplier_part_types",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'MEDIUM'
  AND p.p_size IN (1, 14, 23, 45, 19, 3, 36, 9)
  AND NOT EXISTS (SELECT 1 FROM supplier s
                  WHERE s.s_suppkey = l.l_suppkey AND s.s_acctbal < 0)
GROUP BY 1, 2, 3
""",
    doc="TPC-H Q16-style supplier counts per part class (adapted: no "
    "partsupp, so observed lineitem (part, supplier) pairs play the "
    "supplies relation; no s_comment, so negative-balance suppliers play "
    "the complaints exclusion): distinct-supplier counts per (brand, "
    "type, size) with an anti-join. The oracle uses NOT EXISTS (equality "
    "correlate), not NOT IN: NOT IN over a subquery returns zero rows if "
    "the list contains a NULL and drops NULL-key probe rows, while "
    "Spark's left_anti keeps them — NOT EXISTS matches left_anti "
    "semantics for any future NULL keys. The anti list is tiny (bounded "
    "by |supplier|) so it broadcasts; the part predicate set (two "
    "inequalities + IN list) prunes at the broadcast-join build; "
    "count(DISTINCT) plans as a two-phase expand+agg on the same "
    "grouping shuffle. All-integer outputs — no float discipline.",
    tags=("relational", "join", "anti-join", "aggregate", "tpch"),
)
def tpch_q16_supplier_part_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 14, 23, 45, 19, 3, 36, 9)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad_sup = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad_sup, li["l_suppkey"] == bad_sup["s_suppkey"], "left_anti")
        .join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20_excess_suppliers",
    oracle=f"""
WITH pairq AS (
  SELECT l_partkey, l_suppkey, {sql_dsum("l_quantity")} AS pair_qty
  FROM lineitem GROUP BY 1, 2
), partavg AS (
  SELECT l_partkey AS pk, {sql_davg("pair_qty")} AS avg_qty
  FROM pairq GROUP BY 1
), excess AS (
  SELECT DISTINCT pq.l_suppkey
  FROM pairq pq
  JOIN partavg pa ON pq.l_partkey = pa.pk
  JOIN part p ON p.p_partkey = pq.l_partkey AND p.p_name LIKE 'small%'
  WHERE pq.pair_qty > 2.5 * pa.avg_qty
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN excess e ON s.s_suppkey = e.l_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'EUROPE'
""",
    doc="TPC-H Q20-style excess-supply suppliers (adapted: no "
    "ps_availqty, so 'excess' means a (part, supplier) shipped quantity "
    "above 2.5x the part's average per-supplier quantity — a "
    "concentration test that stays meaningful at any SF): the nested "
    "semi-join chain of the official query becomes aggregate -> "
    "re-aggregate on the same part key (one lineitem shuffle serves "
    "both levels) -> threshold join -> DISTINCT supplier semi-list -> "
    "dim-filtered supplier join. Thresholds compare dsum/davg exact-"
    "decimal doubles; 2.5x is exact in binary so both engines agree.",
    tags=("relational", "join", "semi-join", "aggregate", "tpch"),
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    # shared(): pairq feeds both the per-part re-aggregation and the
    # threshold join — one lineitem scan, not two (per-pair reduction,
    # cache-safe at any SF).
    pairq = shared(
        li.groupBy("l_partkey", "l_suppkey").agg(dsum("l_quantity").alias("pair_qty"))
    )
    partavg = pairq.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("pair_qty").alias("avg_qty")
    )
    small = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    excess = (
        pairq.join(partavg, pairq["l_partkey"] == partavg["pk"])
        .join(small, pairq["l_partkey"] == small["p_partkey"])
        .filter(F.col("pair_qty") > 2.5 * F.col("avg_qty"))
        .select("l_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        sup.join(excess, sup["s_suppkey"] == excess["l_suppkey"], "left_semi")
        .join(F.broadcast(nat), F.col("s_nationkey") == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("s_suppkey", "s_name")
    )


@register(
    "tpch_q21_waiting_orders",
    oracle="""
WITH fl AS (
  SELECT l.l_orderkey, l.l_suppkey,
         (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS nsupp,
         count(DISTINCT CASE WHEN late THEN l_suppkey END) AS nlate,
         max(CASE WHEN late THEN l_suppkey END) AS late_supp
  FROM fl GROUP BY 1
)
SELECT s.s_name, count(*) AS numwait
FROM per_order p
JOIN supplier s ON s.s_suppkey = p.late_supp
WHERE p.nsupp > 1 AND p.nlate = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
""",
    doc="TPC-H Q21-style suppliers who kept orders waiting (adapted: no "
    "commit/receipt dates, so 'late' means shipped more than 60 days "
    "after the order date): for finalized orders with multiple "
    "suppliers, count orders where exactly one supplier was late, per "
    "supplier. The official EXISTS / NOT EXISTS pair over lineitem "
    "becomes a single grouped pass per order — distinct-supplier count, "
    "distinct-late count, and the lone late supplier's key come out of "
    "ONE orderkey shuffle (vs the naive triple self-join's three). "
    "'exactly one distinct late supplier in a multi-supplier order' is "
    "precisely the not-exists-other-late semantics. Counts are exact; "
    "the interval comparison is integer timestamp math in both engines.",
    tags=("relational", "join", "aggregate", "tpch"),
)
def tpch_q21_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    per_order = (
        li.join(ords, li["l_orderkey"] == ords["o_orderkey"])
        .withColumn("late_supp_or_null", F.when(late, F.col("l_suppkey")))
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("nsupp"),
            F.countDistinct("late_supp_or_null").alias("nlate"),
            F.max("late_supp_or_null").alias("late_supp"),
        )
        .filter((F.col("nsupp") > 1) & (F.col("nlate") == 1))
    )
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        # supplier scales with SF — unhinted; AQE decides at runtime.
        per_order.join(sup, F.col("late_supp") == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


#: Fuzzy-match parameters: block on the name's first token, verify with
#: exact Levenshtein distance <= threshold.
FUZZY_MAX_DISTANCE = 4


@register(
    "part_name_fuzzy_matches",
    oracle=f"""
WITH names AS (
  SELECT p_name, count(*) AS n_parts FROM part GROUP BY p_name
),
p AS (
  SELECT p_name, n_parts, string_split(p_name, ' ')[1] AS tok1 FROM names
)
SELECT a.p_name AS name_a, b.p_name AS name_b,
       a.n_parts AS n_parts_a, b.n_parts AS n_parts_b,
       CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS distance
FROM p a JOIN p b ON a.tok1 = b.tok1 AND a.p_name < b.p_name
WHERE levenshtein(a.p_name, b.p_name) <= {FUZZY_MAX_DISTANCE}
""",
    doc="Fuzzy entity resolution on part names: collapse to DISTINCT "
    "names first (the scale move — the quadratic verify runs on the "
    "name vocabulary, never the row count), block on (first token, "
    "length band), then verify candidates with exact Levenshtein "
    "distance <= 4. The length band is LOSSLESS (distance <= d bounds "
    "the length difference at d; width d+1 bands + a one-sided "
    "+-1-band explode catch every qualifying pair exactly once) and is "
    "the skew guard: a Zipfian-dominant first token splits across its "
    "length bands instead of hot-spotting one task. Edit distance is "
    "an integer dynamic program, bit-identical across engines. Scale: "
    "the distinct-name aggregation is the only full-data shuffle; the "
    "blocked self-join shuffles the (tiny) name vocabulary on the "
    "block key.",
    tags=("relational", "join", "fuzzy", "entity-resolution"),
)
def part_name_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fuzzy_name_matches(
        load_table(spark, sf_dir, "part").select("p_name"),
        name_col="p_name",
        max_distance=FUZZY_MAX_DISTANCE,
    )


def fuzzy_name_matches(
    df: DataFrame, *, name_col: str, max_distance: int
) -> DataFrame:
    """Blocked fuzzy self-match on ``name_col`` (see the register() doc).

    Blocking key = (first token, length band): edit distance <= d bounds
    the length difference at d, so with band width d+1 a matching pair's
    bands differ by at most 1 — the left side explodes into {band-1,
    band, band+1} and the equi-join on the right side's exact band
    catches every such pair EXACTLY once (the three exploded bands are
    distinct). Lossless by construction, and the second key is what
    keeps a Zipfian first token from hot-spotting one task: the hot
    block splits across its length bands (tests/test_skew.py asserts
    the spread)."""
    band_w = max_distance + 1
    names = df.groupBy(name_col).agg(F.count(F.lit(1)).alias("n_parts"))
    p = names.select(
        F.col(name_col).alias("p_name"),
        "n_parts",
        F.split(F.col(name_col), " ").getItem(0).alias("tok1"),
        (F.length(name_col) / band_w).cast("int").alias("band"),
    )
    a = p.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        "tok1",
        F.explode(
            F.array(F.col("band") - 1, F.col("band"), F.col("band") + 1)
        ).alias("band"),
    )
    b = p.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        "tok1",
        "band",
    )
    return (
        a.join(b, ["tok1", "band"])
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "distance", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("long")
        )
        .filter(F.col("distance") <= max_distance)
        .select("name_a", "name_b", "n_parts_a", "n_parts_b", "distance")
    )
