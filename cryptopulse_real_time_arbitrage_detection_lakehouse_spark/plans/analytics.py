"""Analytic extensions: exact distribution statistics, regex (BPE-ish)
tokenization, and cumulative window aggregation.

These widen the aggregation/window surface (SURVEY.md A/O families) with
patterns a data-quality or billing pipeline runs daily. All are one-shuffle
plans; the quantile query additionally demonstrates ordered-set aggregates
(``percentile_disc WITHIN GROUP``), verified to pick identical elements in
Spark and DuckDB (discrete percentiles do no arithmetic — exact by
construction, unlike interpolated ``percentile_cont`` whose float blend
could differ in ulps between engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.determinism import (
    SQL_SUM_DECIMAL,
    SUM_DECIMAL,
    dsum,
    fmt_ts,
    sql_dsum,
    sql_fmt_ts,
)
from ..operators.ticks import EVENTS_TICKS_CTE, events_as_ticks
from ..sources.testdata import load_table
from .registry import register

#: quantile probes for the per-symbol price distribution.
QUANTILES = (0.25, 0.5, 0.9, 0.99)

#: BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space
#: symbols — the shape GPT-2-style byte-pair encoders split on before
#: merging. Simple enough that Java regex (Spark) and RE2 (DuckDB) agree.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def _ticks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return events_as_ticks(load_table(spark, sf_dir, "events"))


@register(
    "symbol_price_quantiles",
    oracle=f"""
WITH {EVENTS_TICKS_CTE}
SELECT symbol,
       count(*) AS n_trades,
       {", ".join(f"quantile_disc(price, {q}) AS p{int(q * 100)}" for q in QUANTILES)}
FROM ticks GROUP BY symbol
""",
    doc="Per-symbol price distribution via ordered-set aggregates: "
    "discrete percentiles (p25/p50/p90/p99) pick actual data elements, so "
    "both engines agree bit-for-bit. One shuffle; per-group sort is "
    "partition-local.",
    tags=("aggregate", "quantile"),
)
def symbol_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = _ticks(spark, sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_trades")] + [
        F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY price)").alias(
            f"p{int(q * 100)}"
        )
        for q in QUANTILES
    ]
    return t.groupBy("symbol").agg(*aggs)


@register(
    "text_bpe_token_stats",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang,
         regexp_extract_all(text, '{TOKEN_REGEX}') AS toks
  FROM documents
)
SELECT doc_id, lang,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z]'))) AS n_word_tokens,
       len(list_filter(toks, x -> regexp_matches(x, '^[0-9]'))) AS n_num_tokens,
       len(toks)
         - len(list_filter(toks, x -> regexp_matches(x, '^[A-Za-z0-9]')))
         AS n_sym_tokens
FROM t
""",
    doc="BPE-ish regex tokenization (letter runs | digit runs | single "
    "symbols — the GPT-2 pre-tokenizer shape) with per-class counts: the "
    "token-budget estimator a training pipeline runs over every document. "
    "Row-local regex, no shuffle.",
    tags=("text", "tokenize"),
)
def text_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(TOKEN_REGEX), F.lit(0))
    t = d.select("doc_id", "lang", toks.alias("toks"))
    n_word = F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[A-Za-z]")))
    n_num = F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[0-9]")))
    n_alnum = F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[A-Za-z0-9]")))
    return t.select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_tokens"),
        n_word.cast("long").alias("n_word_tokens"),
        n_num.cast("long").alias("n_num_tokens"),
        (F.size("toks") - n_alnum).cast("long").alias("n_sym_tokens"),
    )


@register(
    "customer_running_revenue",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       {sql_fmt_ts("o_orderdate")} AS order_date,
       CAST(CAST(SUM(CAST(o_totalprice AS {SQL_SUM_DECIMAL}))
              OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS UNBOUNDED PRECEDING) AS VARCHAR) AS DOUBLE)
         AS running_revenue
FROM orders
""",
    doc="Cumulative revenue per customer (running-total window, O5 family "
    "generalized from lag to an unbounded-preceding frame). Terms go "
    "through the exact-decimal discipline so the running sum is "
    "association-independent — DuckDB's segment-tree window accumulation "
    "and Spark's running fold would otherwise differ in ulps.",
    tags=("window-function", "relational"),
)
def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        fmt_ts("o_orderdate", "order_date"),
        F.sum(F.col("o_totalprice").cast(SUM_DECIMAL))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
    )


#: KMV (k-minimum-values) sketch parameters: estimate distinct count from
#: the k smallest hash values. Relative error ~ 1/sqrt(k-2); k=64 gives
#: ~13%. SALTS bounds the per-group partial-sketch state: level 1 keeps k
#: mins per (group, salt) bucket, level 2 merges SALTS bounded arrays —
#: the mergeable-sketch shape (partials combine associatively), which is
#: what makes the estimator a one-pass distributed aggregate. At larger
#: scale raise SALTS so each bucket's collect stays small; correctness is
#: unaffected (salting partitions the distinct hash space).
KMV_K, KMV_SALTS = 64, 16
_HASH_SPACE = float(2**32)


@register(
    "event_user_distinct_kmv",
    oracle=f"""
WITH h AS (
  SELECT DISTINCT event_type,
         CAST(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS x
  FROM events
),
part AS (
  SELECT event_type, x % {KMV_SALTS} AS salt,
         list_sort(list(x))[:{KMV_K}] AS mins
  FROM h GROUP BY event_type, x % {KMV_SALTS}
),
merged AS (
  SELECT event_type, list_sort(flatten(list(mins))) AS all_mins
  FROM part GROUP BY event_type
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY event_type
)
SELECT m.event_type, e.n_exact,
       CASE WHEN len(m.all_mins) >= {KMV_K}
            THEN CAST({KMV_K} - 1 AS DOUBLE)
                 / (CAST(m.all_mins[{KMV_K}] AS DOUBLE) / {_HASH_SPACE!r})
            ELSE CAST(len(m.all_mins) AS DOUBLE) END AS kmv_estimate
FROM merged m JOIN exact e USING (event_type)
""",
    doc="KMV (k-minimum-values) distinct-count sketch per event_type, "
    "side-by-side with the exact count. Deterministic approximate "
    "distinct: hash user_id (md5 -> 32-bit), keep the k=64 smallest "
    "hashes, estimate N ~ (k-1)/kth_smallest_normalized — identical bits "
    "in both engines, unlike HyperLogLog whose register layout is engine-"
    "private. Built as a two-level mergeable aggregate: partial k-min "
    "sketches per (group, salt) bucket, then a bounded merge of "
    "SALTS x k values — no unbounded per-group state, the property that "
    "lets partial sketches combine across 1000 executors.",
    tags=("analytics", "sketch", "distinct"),
)
def event_user_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    x = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        .alias("x")
    )
    h = events.select("event_type", x).distinct()
    part = h.groupBy("event_type", (F.col("x") % KMV_SALTS).alias("salt")).agg(
        F.slice(F.sort_array(F.collect_list("x")), 1, KMV_K).alias("mins")
    )
    merged = part.groupBy("event_type").agg(
        F.sort_array(F.flatten(F.collect_list("mins"))).alias("all_mins")
    )
    kth = F.element_at(F.col("all_mins"), KMV_K).cast("double") / F.lit(_HASH_SPACE)
    est = merged.select(
        "event_type",
        F.when(
            F.size("all_mins") >= KMV_K, F.lit(float(KMV_K - 1)) / kth
        )
        .otherwise(F.size("all_mins").cast("double"))
        .alias("kmv_estimate"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return est.join(exact, "event_type").select(
        "event_type", "n_exact", "kmv_estimate"
    )


@register(
    "customer_order_moving_avg",
    oracle=f"""
SELECT o_custkey, o_orderkey,
       {sql_fmt_ts("o_orderdate")} AS order_date,
       (CAST(CAST(SUM(CAST(o_totalprice AS {SQL_SUM_DECIMAL}))
              OVER w AS VARCHAR) AS DOUBLE)
        / CAST(COUNT(*) OVER w AS DOUBLE)) AS ma4_totalprice
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
    doc="Bounded-frame moving average: each order's total averaged with "
    "its customer's 3 preceding orders (ROWS BETWEEN 3 PRECEDING AND "
    "CURRENT ROW — the bounded frame spec the cumulative query lacks). "
    "Partitioned by customer, so parallelism scales with customer count; "
    "the frame sum uses the exact-decimal discipline then one IEEE "
    "division, keeping both engines bit-identical.",
    tags=("window-function", "relational"),
)
def customer_order_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, W.currentRow)
    )
    frame_sum = F.sum(F.col("o_totalprice").cast(SUM_DECIMAL)).over(w).cast("double")
    frame_n = F.count(F.lit(1)).over(w).cast("double")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        fmt_ts("o_orderdate", "order_date"),
        (frame_sum / frame_n).alias("ma4_totalprice"),
    )


@register(
    "order_rank_analytics",
    oracle="""
SELECT o_custkey, o_orderkey,
       row_number() OVER w AS rn,
       rank()       OVER w2 AS rnk,
       dense_rank() OVER w2 AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist()    OVER w AS cume
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey),
       w2 AS (PARTITION BY o_custkey ORDER BY o_orderpriority)
""",
    doc="Ranking-function sweep per customer: row_number / rank / "
    "dense_rank / ntile / percent_rank / cume_dist in one pass. Both "
    "window specs share the (o_custkey) partitioning, so Spark plans ONE "
    "exchange and two in-partition sorts. rank/dense_rank run on a "
    "low-cardinality key (priority) to exercise tie semantics; the "
    "ordering key set of w is unique, so every rank output is "
    "deterministic. percent_rank/cume_dist divide exact integer "
    "counts - IEEE-identical across engines.",
    tags=("window-function", "relational"),
)
def order_rank_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    w2 = W.partitionBy("o_custkey").orderBy("o_orderpriority")
    return ords.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w2).cast("long").alias("rnk"),
        F.dense_rank().over(w2).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "order_date_dimensions",
    oracle="""
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
       CAST(month(o_orderdate) AS BIGINT) AS mth,
       CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
       CAST(isodow(o_orderdate) AS BIGINT) AS iso_dow,
       CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
       strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
       strftime(o_orderdate + INTERVAL 90 DAY, '%Y-%m-%d') AS due_date,
       CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS BIGINT)
         AS days_to_y2k
FROM orders
WHERE o_custkey % 200 = 0
""",
    doc="Date/time function sweep: calendar field extraction (year / "
    "quarter / month / day-of-month / ISO weekday / day-of-year), "
    "month-end, interval arithmetic, and day differences — the date "
    "dimension columns a warehouse derives at ingest. Row-local, fully "
    "codegen'd, no shuffle. ISO weekday bridges the engines' different "
    "dayofweek conventions (Spark Sun=1 vs DuckDB Mon=1).",
    tags=("functions", "relational"),
)
def order_date_dimensions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 200 == 0)
    d = F.col("o_orderdate")
    return ords.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.quarter(d).cast("long").alias("qtr"),
        F.month(d).cast("long").alias("mth"),
        F.dayofmonth(d).cast("long").alias("dom"),
        # Spark: dayofweek is Sun=1..Sat=7; ISO wants Mon=1..Sun=7
        ((F.dayofweek(d) + 5) % 7 + 1).cast("long").alias("iso_dow"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d.cast("date"), 90), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.lit("2000-01-01").cast("date"), d.cast("date"))
        .cast("long")
        .alias("days_to_y2k"),
    )


@register(
    "part_name_string_ops",
    oracle="""
SELECT p_partkey,
       upper(p_brand) AS brand_upper,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_name, 1, 8) AS name_prefix,
       replace(p_type, ' ', '_') AS type_slug,
       CAST(strpos(p_type, 'BRUSHED') AS BIGINT) AS brushed_at,
       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_padded,
       regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
       CAST(len(string_split(p_name, ' ')) AS BIGINT) AS n_words,
       reverse(p_brand) AS brand_rev
FROM part
WHERE p_partkey % 10 = 0
""",
    doc="String function sweep over part names: case mapping, length, "
    "substring, replace, find-position, zero-padding, anchored regex "
    "capture, split-count, reverse — the cleanup/standardization kit of "
    "an entity-resolution pipeline. Row-local and codegen'd; the regex "
    "is anchored and character-class-only so Java regex and DuckDB RE2 "
    "agree.",
    tags=("functions", "text"),
)
def part_name_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 10 == 0)
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").cast("long").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.regexp_replace("p_type", " ", "_").alias("type_slug"),
        F.locate("BRUSHED", F.col("p_type")).cast("long").alias("brushed_at"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.size(F.split("p_name", " ")).cast("long").alias("n_words"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
    )


@register(
    "emb_vector_ops",
    oracle="""
SELECT vec_id, label,
       CAST(len(embedding) AS BIGINT) AS dims,
       CAST(list_max(embedding) AS DOUBLE) AS max_val,
       CAST(list_min(embedding) AS DOUBLE) AS min_val,
       CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS abs_max,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
       CAST(list_sort(embedding[1:4])[4] AS DOUBLE) AS first4_max
FROM embeddings
""",
    doc="Array-function sweep over the embedding column: size, "
    "element-wise max/min, abs-transform + max, lambda filter count, "
    "slice + sort + index — the array kit (transform/filter/slice/"
    "sort) applied per row with zero shuffle. All outputs are "
    "comparison- or count-based (no float summation), so float32 "
    "widening to double is exact and both engines agree bit-for-bit.",
    tags=("functions", "similarity"),
)
def emb_vector_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.size(e).cast("long").alias("dims"),
        F.array_max(e).cast("double").alias("max_val"),
        F.array_min(e).cast("double").alias("min_val"),
        F.array_max(F.transform(e, lambda x: F.abs(x))).cast("double").alias("abs_max"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.element_at(F.array_sort(F.slice(e, 1, 4)), 4)
        .cast("double")
        .alias("first4_max"),
    )


@register(
    "order_stats_moments",
    oracle=f"""
WITH j AS (
  SELECT c.c_mktsegment AS segment, o.o_totalprice AS x, c.c_acctbal AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
s AS (
  SELECT segment,
         CAST(count(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(CAST(x AS {SQL_SUM_DECIMAL})) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(x * x AS {SQL_SUM_DECIMAL})) AS VARCHAR) AS DOUBLE) AS sx2,
         CAST(CAST(SUM(CAST(y AS {SQL_SUM_DECIMAL})) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(y * y AS {SQL_SUM_DECIMAL})) AS VARCHAR) AS DOUBLE) AS sy2,
         CAST(CAST(SUM(CAST(x * y AS {SQL_SUM_DECIMAL})) AS VARCHAR) AS DOUBLE) AS sxy
  FROM j GROUP BY segment
)
SELECT segment,
       CAST(n AS BIGINT) AS n_orders,
       sx / n AS mean_price,
       sqrt((sx2 - sx * sx / n) / (n - 1)) AS stddev_price,
       (n * sxy - sx * sy) / (sqrt(n * sx2 - sx * sx) * sqrt(n * sy2 - sy * sy))
         AS price_balance_corr
FROM s
""",
    doc="Second-moment statistics with the exact-sum discipline: mean, "
    "sample stddev, and Pearson correlation per market segment, derived "
    "from five exact decimal sums (x, x^2, y, y^2, xy) rather than the "
    "engines' builtin stddev/corr — builtin moment aggregates are "
    "order-dependent double sums that cannot hash-match across engines, "
    "while exact sums + an identical post-aggregation IEEE expression "
    "are bit-identical. One fact shuffle (orders on custkey) and a "
    "5-row result; the moment sums are map-side partials like any sum.",
    tags=("analytics", "aggregate", "statistics"),
)
def order_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    x, y = F.col("o_totalprice"), F.col("c_acctbal")

    def es(c):
        return F.sum(c.cast(SUM_DECIMAL)).cast("double")

    agg = (
        ords.join(cust, ords["o_custkey"] == cust["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            es(x).alias("sx"),
            es(x * x).alias("sx2"),
            es(y).alias("sy"),
            es(y * y).alias("sy2"),
            es(x * y).alias("sxy"),
        )
    )
    n, sx, sx2 = F.col("n"), F.col("sx"), F.col("sx2")
    sy, sy2, sxy = F.col("sy"), F.col("sy2"), F.col("sxy")
    return agg.select(
        "segment",
        n.cast("long").alias("n_orders"),
        (sx / n).alias("mean_price"),
        F.sqrt((sx2 - sx * sx / n) / (n - 1)).alias("stddev_price"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy))
        ).alias("price_balance_corr"),
    )


@register(
    "order_value_window_kit",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice,
       lag(o_totalprice) OVER w AS prev_price,
       lead(o_totalprice) OVER w AS next_price,
       first_value(o_totalprice) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS first_price,
       last_value(o_totalprice) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS last_price,
       nth_value(o_totalprice, 2) OVER
         (w ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         AS second_price
FROM orders
WHERE o_custkey % 100 = 7
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
    doc="Value-window function kit (lead/lag/first_value/last_value/"
    "nth_value) over each customer's order history — the offset/frame "
    "family the ranking kit (order_rank_analytics) does not touch. All "
    "six functions share ONE window spec (partition custkey, order by "
    "date with orderkey tiebreak), so the plan is a single hash shuffle "
    "+ one in-partition sort serving every column; the unbounded frames "
    "are declared explicitly because last_value/nth_value default to "
    "'rows up to current' in both engines (a correctness trap this "
    "query pins). Partitioning is by customer: high cardinality, full "
    "parallelism at any SF. Values pass through untouched — no float "
    "discipline needed.",
    tags=("analytics", "window-function"),
)
def order_value_window_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 7)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wfull).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
    )


@register(
    "user_retention_cohorts",
    oracle="""
WITH firsts AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week FROM events
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS BIGINT)
         AS weeks_since,
       count(DISTINCT a.user_id) AS n_users
FROM active a JOIN firsts f ON a.user_id = f.user_id
GROUP BY 1, 2
""",
    doc="Weekly retention cohorts — the standard product-analytics "
    "operator: each user's cohort is the week of their first event; the "
    "cell (cohort, weeks-since) counts users still active that week. "
    "Three stages share the user_id partitioning: first-event agg, "
    "distinct (user, week) activity, and the join — one logical key, so "
    "AQE reuses the exchange instead of reshuffling; only the final "
    "(cohort, offset) regroup re-keys, onto a frame bounded by "
    "users x weeks. Both engines truncate weeks to ISO Monday and the "
    "offset divides exact day counts, so every cell matches exactly.",
    tags=("analytics", "events", "cohort"),
)
def user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            F.expr("CAST(datediff(active_week, cohort_week) DIV 7 AS BIGINT)").alias(
                "weeks_since"
            ),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@register(
    "event_funnel_conversion",
    oracle="""
WITH stamped AS (
  SELECT user_id, event_type, ts,
         min(CASE WHEN event_type = 'view' THEN ts END)
           OVER (PARTITION BY user_id) AS t_view
  FROM events
), s2 AS (
  SELECT user_id, event_type, ts, t_view,
         min(CASE WHEN event_type = 'click' AND ts >= t_view THEN ts END)
           OVER (PARTITION BY user_id) AS t_click
  FROM stamped
), s3 AS (
  SELECT user_id, t_view, t_click,
         min(CASE WHEN event_type = 'purchase' AND ts >= t_click THEN ts END)
           OVER (PARTITION BY user_id) AS t_purchase
  FROM s2
), per_user AS (
  SELECT user_id, max(t_view) AS t_view, max(t_click) AS t_click,
         max(t_purchase) AS t_purchase
  FROM s3 GROUP BY user_id
)
SELECT count(t_view) AS n_view,
       count(t_click) AS n_click_after_view,
       count(t_purchase) AS n_purchase_after_click,
       CAST(count(t_click) AS DOUBLE) / CAST(count(t_view) AS DOUBLE)
         AS view_to_click,
       CAST(count(t_purchase) AS DOUBLE) / CAST(count(t_click) AS DOUBLE)
         AS click_to_purchase
FROM per_user
""",
    doc="Ordered funnel conversion (view -> click -> purchase): each "
    "stage's timestamp is the earliest qualifying event AT OR AFTER the "
    "previous stage's — the sequential constraint that separates a "
    "funnel from three independent counts. Three chained unbounded "
    "window minima share ONE user_id hash partitioning (no ORDER BY in "
    "the frame, so no per-user sort), then a per-user collapse and a "
    "single-row conditional-count summary. Scale: one shuffle on the "
    "high-cardinality user key; everything after operates on one row "
    "per user. Timestamps compare exactly; the conversion ratios "
    "divide exact counts.",
    tags=("analytics", "events", "funnel", "window-function"),
)
def event_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = ev.withColumn("t_view", t_view)
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ts") >= F.col("t_view")),
            F.col("ts"),
        )
    ).over(w)
    s2 = s1.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("t_click")),
            F.col("ts"),
        )
    ).over(w)
    s3 = s2.withColumn("t_purchase", t_purchase)
    per_user = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
        (F.count("t_click").cast("double") / F.count("t_view").cast("double")).alias(
            "view_to_click"
        ),
        (
            F.count("t_purchase").cast("double") / F.count("t_click").cast("double")
        ).alias("click_to_purchase"),
    )


@register(
    "user_event_set_ops",
    oracle="""
WITH clickers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
buyers AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
both_sides AS (SELECT user_id FROM clickers INTERSECT SELECT user_id FROM buyers),
click_only AS (SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers),
buy_only AS (SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers)
SELECT (SELECT count(*) FROM clickers) AS n_clickers,
       (SELECT count(*) FROM buyers) AS n_buyers,
       (SELECT count(*) FROM both_sides) AS n_both,
       (SELECT count(*) FROM click_only) AS n_click_only,
       (SELECT count(*) FROM buy_only) AS n_buy_only
""",
    doc="Set operations over user cohorts: INTERSECT and EXCEPT (both "
    "DISTINCT semantics) between clicking and purchasing users — the "
    "set-op family the join coverage (semi/anti) leaves untested. Spark "
    "plans intersect/except as hash left-semi/anti joins over "
    "deduplicated keys, so each leg is one user_id shuffle; the five "
    "single-row counts broadcast into one output row. Counts are "
    "integer-exact.",
    tags=("analytics", "set-ops", "events"),
)
def user_event_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clickers = (
        ev.filter(F.col("event_type") == "click").select("user_id").distinct()
    )
    buyers = (
        ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    legs = {
        "n_clickers": clickers,
        "n_buyers": buyers,
        "n_both": clickers.intersect(buyers),
        "n_click_only": clickers.exceptAll(buyers).distinct(),
        "n_buy_only": buyers.exceptAll(clickers).distinct(),
    }
    out = None
    for name, df in legs.items():
        leg = df.agg(F.count(F.lit(1)).alias(name))
        out = leg if out is None else out.crossJoin(F.broadcast(leg))
    return out


@register(
    "emb_vector_predicates",
    oracle="""
SELECT vec_id, label,
       len(list_filter(embedding, x -> x > 0)) AS n_positive,
       (len(list_filter(embedding, x -> abs(x) > 0.3)) > 0) AS any_large,
       (len(list_filter(embedding, x -> abs(x) <= 1.0)) = len(embedding))
         AS all_bounded,
       CAST(list_position(embedding, list_aggregate(embedding, 'max'))
            AS BIGINT) AS argmax_pos
FROM embeddings
""",
    doc="Higher-order predicate kit over the embedding array: filter-count "
    "(n_positive), EXISTS (any coordinate above a magnitude), FORALL "
    "(every coordinate bounded), and argmax position (array_position of "
    "the array max — first match, same rule in both engines). Row-local "
    "projection, zero shuffle; float32 comparisons against exact binary "
    "thresholds (0.3 rounds identically on read in both engines, 1.0 is "
    "exact) so the booleans match bit-for-bit.",
    tags=("similarity", "array", "higher-order"),
)
def emb_vector_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        "label",
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.exists(e, lambda x: F.abs(x) > 0.3).alias("any_large"),
        F.forall(e, lambda x: F.abs(x) <= 1.0).alias("all_bounded"),
        F.array_position(e, F.array_max(e)).alias("argmax_pos"),
    )


@register(
    "customer_null_semantics",
    oracle=f"""
SELECT c_nationkey,
       count(*) AS n_customers,
       count(c_acctbal) AS n_with_balance,
       count(CASE WHEN c_acctbal IS NOT DISTINCT FROM NULL THEN 1 END)
         AS n_null_balance,
       {sql_dsum("coalesce(c_acctbal, 0.0)")} AS total_balance,
       count(nullif(c_mktsegment, 'BUILDING')) AS n_non_building
FROM customer
GROUP BY c_nationkey
""",
    doc="Null-semantics kit over the customer table (the regenerated "
    "testdata gives order-less customers NULL balances, so every branch "
    "is exercised): count(col) vs count(*) null skipping, null-safe "
    "equality (eqNullSafe / IS NOT DISTINCT FROM — the three-valued-"
    "logic escape hatch), coalesce defaulting inside an exact-decimal "
    "sum, and nullif sentinel conversion. Row-local expressions + one "
    "bounded-key aggregation; both engines implement the same SQL "
    "three-valued logic so counts match exactly.",
    tags=("analytics", "null-semantics", "aggregate"),
)
def customer_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.count("c_acctbal").alias("n_with_balance"),
        F.count(
            F.when(F.col("c_acctbal").eqNullSafe(F.lit(None).cast("double")), 1)
        ).alias("n_null_balance"),
        dsum(F.coalesce(F.col("c_acctbal"), F.lit(0.0))).alias("total_balance"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))).alias(
            "n_non_building"
        ),
    )


@register(
    "event_sketch_accuracy_audit",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS hll_within_10pct,
       quantile_disc(value, 0.5) AS median_value,
       TRUE AS approx_median_within_5pct_range
FROM events GROUP BY event_type
""",
    doc="Engine-builtin sketch accuracy audit: per event_type, "
    "HyperLogLog++ (`approx_count_distinct`, rsd 0.02) must land within "
    "10% of the exact distinct-user count, and `approx_percentile` "
    "within 5% of the value range around the exact discrete median. "
    "Exact values are emitted alongside the booleans; the oracle asserts "
    "the booleans are TRUE, so any engine regression in the sketches "
    "fails parity. Bounds are generous multiples of the configured sketch "
    "error, so they hold at any SF and shuffle-partition count (sketch "
    "merge order can shift estimates slightly but never near the bound). "
    "Complements the KMV query above: that one pins a portable sketch "
    "bit-for-bit; this one pins the engine's native sketches "
    "behaviorally. One shuffle, partial aggregation map-side.",
    tags=("analytics", "sketch", "audit"),
)
def event_sketch_accuracy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    exact_users = F.countDistinct("user_id")
    hll_users = F.approx_count_distinct("user_id", rsd=0.02)
    exact_med = F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
    approx_med = F.expr("approx_percentile(value, 0.5, 10000)")
    vrange = F.max("value") - F.min("value")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        exact_users.alias("exact_users"),
        (F.abs(hll_users - exact_users) <= F.lit(0.1) * exact_users).alias(
            "hll_within_10pct"
        ),
        exact_med.alias("median_value"),
        (F.abs(approx_med - exact_med) <= F.lit(0.05) * vrange).alias(
            "approx_median_within_5pct_range"
        ),
    )


@register(
    "user_event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM pairs
  GROUP BY from_type
)
SELECT p.from_type, p.to_type, p.n,
       CAST(p.n AS DOUBLE) / t.n_from AS p_transition
FROM pairs p JOIN tot t USING (from_type)
""",
    doc="First-order Markov transition matrix over per-user event "
    "sequences: P(next = b | current = a) with exact pair counts — "
    "the product-analytics primitive behind 'what do users do after "
    "signup'. Sequences order by (ts, event_id) so duplicate "
    "timestamps cannot make lead() nondeterministic. One double "
    "division per cell from exact BIGINT operands. Scale: the lead() "
    "window partitions by user (millions of small partitions — the "
    "shape Spark's window operator is built for); the matrix itself "
    "is |event_types|^2 regardless of corpus size.",
    tags=("events", "analytics", "window-function", "markov"),
)
def user_event_transition_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as WW

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = WW.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = pairs.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    return pairs.join(F.broadcast(tot), "from_type").select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.col("n_from")).alias("p_transition"),
    )


#: spike gate: minute count vs trailing window mean on the exact grid
SPIKE_WINDOW_MIN, SPIKE_FACTOR = 60, 3


@register(
    "event_rate_spikes",
    oracle=f"""
WITH minutes AS (
  SELECT date_trunc('minute', ts) AS m, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
roll AS (
  SELECT m, n,
         CAST(sum(n) OVER w AS BIGINT) AS win_sum,
         CAST(count(*) OVER w AS BIGINT) AS win_n
  FROM minutes
  WINDOW w AS (ORDER BY m
               ROWS BETWEEN {SPIKE_WINDOW_MIN} PRECEDING AND 1 PRECEDING)
)
SELECT strftime(m, '%Y-%m-%d %H:%M:%S') AS minute_start, n,
       win_sum, win_n,
       CAST(n * win_n AS DOUBLE) / win_sum AS spike_ratio
FROM roll
WHERE win_n = {SPIKE_WINDOW_MIN}
  AND n * win_n > {SPIKE_FACTOR} * win_sum
""",
    doc=f"Ingest-rate spike detector: flag minutes whose event count "
    f"exceeds {SPIKE_FACTOR}x the trailing {SPIKE_WINDOW_MIN}-minute "
    "mean — the observability alarm a feed-health monitor runs. The "
    "comparison is cross-multiplied (n·win_n > k·win_sum) so the gate "
    "is EXACT integer arithmetic — no division participates in the "
    "predicate, and the reported ratio is the only rounded double. "
    "Partial leading windows are excluded (win_n pinned), so a "
    "mid-stream deployment cannot false-alarm on short history. "
    "Scale: per-minute pre-aggregation first (map-side combine to a "
    "calendar-bounded series), then the trailing window runs over "
    "minutes — `operators.rolling.chunked_rolling` is the drop-in "
    "when the minute series itself outgrows one partition.",
    tags=("events", "observability", "window-function", "rolling"),
)
def event_rate_spikes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as WW

    minutes = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("minute", "ts").alias("m"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        WW.orderBy("m")
        .rowsBetween(-SPIKE_WINDOW_MIN, -1)
    )
    roll = minutes.select(
        "m",
        "n",
        F.sum("n").over(w).alias("win_sum"),
        F.count(F.lit(1)).over(w).alias("win_n"),
    )
    return roll.filter(
        (F.col("win_n") == SPIKE_WINDOW_MIN)
        & (F.col("n") * F.col("win_n") > SPIKE_FACTOR * F.col("win_sum"))
    ).select(
        fmt_ts("m", "minute_start"),
        "n",
        "win_sum",
        "win_n",
        ((F.col("n") * F.col("win_n")).cast("double") / F.col("win_sum")).alias(
            "spike_ratio"
        ),
    )


@register(
    "event_type_user_chi_square",
    oracle="""
WITH o AS (
  SELECT event_type, user_id % 4 AS cohort, CAST(count(*) AS HUGEINT) AS obs
  FROM events GROUP BY event_type, user_id % 4
),
r AS (SELECT event_type, CAST(sum(obs) AS HUGEINT) AS rt FROM o GROUP BY event_type),
c AS (SELECT cohort, CAST(sum(obs) AS HUGEINT) AS ct FROM o GROUP BY cohort),
g AS (SELECT CAST(sum(obs) AS HUGEINT) AS n FROM o),
terms AS (
  SELECT CAST(round(
           CAST(CAST((o.obs * g.n - r.rt * c.ct) * (o.obs * g.n - r.rt * c.ct)
                     AS VARCHAR) AS DOUBLE)
           / CAST(CAST(g.n * r.rt * c.ct AS VARCHAR) AS DOUBLE)
           / CAST(CAST(g.n AS VARCHAR) AS DOUBLE) * 1e10) AS BIGINT) AS tq
  FROM o JOIN r USING (event_type) JOIN c USING (cohort) CROSS JOIN g
),
dims AS (
  SELECT (SELECT count(*) FROM r) AS nr, (SELECT count(*) FROM c) AS nc
)
SELECT CAST(CAST(sum(tq) AS VARCHAR) AS DOUBLE) / 1e10 AS chi2,
       CAST((dims.nr - 1) * (dims.nc - 1) AS BIGINT) AS dof,
       (SELECT CAST(n AS BIGINT) FROM g) AS n_events
FROM terms, dims GROUP BY dims.nr, dims.nc
""",
    doc="Pearson chi-square test of independence between event_type and "
    "a user cohort (user_id mod 4) — the A/B-bucket sanity check every "
    "experimentation pipeline runs before trusting assignment (a "
    "significant chi2 means cohort hashing correlates with behavior, "
    "i.e. broken randomization). Exact cross-engine: each cell's "
    "(O*N - R*C)^2 and N*R*C are exact 128-bit integers, the per-cell "
    "term is two IEEE divisions of correctly-rounded operands — "
    "written as ((...)/(N*R*C))/N because a single N^2*R*C denominator "
    "can overflow 128 bits — then QUANTIZED to the 1e10 grid and "
    "summed exactly (a raw double sum would be shuffle-order-"
    "dependent). p-values need the incomplete gamma function, which "
    "engines round differently — consumers test chi2 against their "
    "own critical table. Scale: one groupBy over events; margins come "
    "back broadcast; output is one row.",
    tags=("analytics", "events", "statistics", "aggregate"),
)
def event_type_user_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 4).alias("cohort")
    )
    o = ev.groupBy("event_type", "cohort").agg(
        F.count(F.lit(1)).cast(dec).alias("obs")
    )
    r = o.groupBy("event_type").agg(F.sum("obs").cast(dec).alias("rt"))
    c = o.groupBy("cohort").agg(F.sum("obs").cast(dec).alias("ct"))
    g = o.agg(F.sum("obs").cast(dec).alias("n"))
    diff = F.col("obs") * F.col("n") - F.col("rt") * F.col("ct")
    term = (
        (diff * diff).cast("double")
        / (F.col("n") * F.col("rt") * F.col("ct")).cast("double")
        / F.col("n").cast("double")
    )
    terms = (
        o.join(F.broadcast(r), "event_type")
        .join(F.broadcast(c), "cohort")
        .crossJoin(F.broadcast(g))
        .select(F.round(term * F.lit(1e10)).cast("long").alias("tq"))
    )
    nr = r.agg(F.count(F.lit(1)).alias("nr"))
    nc = c.agg(F.count(F.lit(1)).alias("nc"))
    return (
        terms.agg(
            (F.sum(F.col("tq").cast(dec)).cast("double") / F.lit(1e10)).alias(
                "chi2"
            )
        )
        .crossJoin(F.broadcast(nr))
        .crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(g))
        .select(
            "chi2",
            ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
            F.col("n").cast("long").alias("n_events"),
        )
    )


@register(
    "order_value_equidepth_histogram",
    oracle=f"""
WITH b AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders
)
SELECT CAST(bucket AS BIGINT) AS bucket,
       count(*) AS n_orders,
       min(o_totalprice) AS lo,
       max(o_totalprice) AS hi,
       {sql_dsum("o_totalprice")} AS bucket_revenue
FROM b GROUP BY bucket
""",
    doc="Equi-DEPTH histogram of order values via NTILE(10) — the "
    "distribution summary optimizers and dashboards both want (equal "
    "POPULATION per bucket, so tails get resolution where equi-width "
    "buckets go empty). NTILE is deterministic only if the ordering "
    "is total: ties on o_totalprice break on o_orderkey, so both "
    "engines assign identical bucket membership (both follow the SQL "
    "rule that the first n%10 buckets take the extra row). Values "
    "pass through exactly; the per-bucket sum uses the decimal "
    "discipline. Scale note: a global NTILE is a total sort — correct "
    "for the summary it is (one pass, output is 10 rows); per-GROUP "
    "histograms would partition the window instead.",
    tags=("analytics", "window-function", "histogram", "ntile"),
)
def order_value_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = W.orderBy("o_totalprice", "o_orderkey")
    b = o.select(
        "o_totalprice", F.ntile(10).over(w).cast("long").alias("bucket")
    )
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
        dsum("o_totalprice").alias("bucket_revenue"),
    )


@register(
    "user_event_top_paths",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE e3 IS NOT NULL
GROUP BY e1, e2, e3
ORDER BY n DESC, e1, e2, e3 LIMIT 15
""",
    doc="Top-15 three-step behavior paths — the path-analysis view that "
    "generalizes the 1-step Markov matrix (user_event_transition_"
    "matrix): consecutive event trigrams per user, ordered by "
    "(ts, event_id) so duplicate timestamps cannot reorder a path. "
    "One user-partitioned window pass produces both leads, exact "
    "counts, deterministic top-k ties on the path itself; the result "
    "is bounded by |event_types|^3 regardless of corpus. "
    "TakeOrderedAndProject, no global sort.",
    tags=("analytics", "events", "path", "window-function", "topk"),
)
def user_event_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(15)
    )


@register(
    "funnel_time_to_convert",
    oracle="""
WITH stamped AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
),
conv AS (
  SELECT e.user_id,
         CAST(epoch_us(min(e.ts)) - epoch_us(s.t_view) AS BIGINT) AS us
  FROM events e JOIN stamped s ON e.user_id = s.user_id
  WHERE e.event_type = 'purchase' AND s.t_view IS NOT NULL
    AND e.ts >= s.t_view
  GROUP BY e.user_id, s.t_view
)
SELECT CAST(count(*) AS BIGINT) AS n_converted,
       CAST(min(us) AS BIGINT) AS min_us,
       CAST(max(us) AS BIGINT) AS max_us,
       CAST(quantile_disc(us, 0.5) AS BIGINT) AS median_us,
       CAST(quantile_disc(us, 0.9) AS BIGINT) AS p90_us
FROM conv
""",
    doc="Funnel latency distribution: per converting user, microseconds "
    "from first view to first purchase AT OR AFTER it, summarized as "
    "count/min/max plus DISCRETE median and p90 — percentile_disc "
    "selects an actual element, so both engines pick the identical "
    "microsecond value with no interpolation arithmetic to disagree "
    "on (the established exact-quantile discipline). Two passes "
    "sharing the user_id key: first-view stamp, then earliest "
    "qualifying purchase; output is one row. The latency histogram "
    "is what converts a funnel RATE into a funnel SLA.",
    tags=("analytics", "events", "funnel", "quantile", "aggregate"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    stamped = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "t_view"
        )
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(stamped, "user_id")
        .filter(F.col("t_view").isNotNull() & (F.col("ts") >= F.col("t_view")))
        .groupBy("user_id", "t_view")
        .agg(
            (
                F.unix_micros(F.min("ts")) - F.unix_micros(F.col("t_view"))
            ).alias("us")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).cast("long").alias("n_converted"),
        F.min("us").cast("long").alias("min_us"),
        F.max("us").cast("long").alias("max_us"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY us)")
        .cast("long")
        .alias("median_us"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY us)")
        .cast("long")
        .alias("p90_us"),
    )


@register(
    "user_clamped_balance_stats",
    oracle="""
WITH RECURSIVE ranked AS MATERIALIZED (
  SELECT user_id,
         CAST(floor(value * 100.0) AS BIGINT)
           * (CASE WHEN event_type IN ('purchase', 'signup')
                   THEN 1 ELSE -1 END) AS x,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS rn
  FROM events
),
rec(user_id, rn, bal) AS (
  SELECT user_id, rn, greatest(CAST(0 AS BIGINT), x) FROM ranked
  WHERE rn = 1
  UNION ALL
  SELECT r.user_id, r.rn, greatest(CAST(0 AS BIGINT), p.bal + r.x)
  FROM ranked r JOIN rec p ON p.user_id = r.user_id AND r.rn = p.rn + 1
),
fin AS (
  SELECT user_id, max(bal) AS peak,
         arg_max(bal, rn) AS final_bal,
         CAST(sum(CASE WHEN bal = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_at_floor
  FROM rec GROUP BY user_id
)
SELECT user_id % 10 AS user_bucket,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(sum(peak) AS BIGINT) AS total_peak,
       CAST(sum(final_bal) AS BIGINT) AS total_final,
       CAST(sum(n_at_floor) AS BIGINT) AS floor_touches
FROM fin GROUP BY 1
""",
    doc="Clamped running balance per user (credits = purchase/signup "
    "value, debits = everything else, floored at zero — the prepaid-"
    "wallet / inventory-floor semantics), summarized per user bucket. "
    "This is the canonical NON-ASSOCIATIVE scan: the zero-clamp makes "
    "each step depend on the clamped prior state, so neither a window "
    "frame nor chunked_cumsum's offset composition can express it — "
    "it runs on `operators.recursive.keyed_exact_clamped_cumsum` "
    "(sequential per user, users are the parallel unit) against a "
    "recursive-CTE oracle. Amounts quantize to integer cents; every "
    "step is integer max/add, so the trajectory is exact with NO "
    "rounding argument needed. Peak, final, and floor-touch counts "
    "hash-match bit-for-bit.",
    tags=("analytics", "events", "recursive", "arrow-kernel",
          "aggregate"),
)
def user_clamped_balance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.recursive import keyed_exact_clamped_cumsum

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (
            F.floor(F.col("value") * F.lit(100.0)).cast("long")
            * F.when(
                F.col("event_type").isin("purchase", "signup"), F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias("x"),
    )
    bal = keyed_exact_clamped_cumsum(
        ev,
        key_cols=["user_id"],
        order_cols=["ts", "event_id"],
        x_col="x",
    )
    fin = bal.groupBy("user_id").agg(
        F.max("balance").alias("peak"),
        F.max_by("balance", F.struct("ts", "event_id")).alias("final_bal"),
        F.sum(F.when(F.col("balance") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_at_floor"),
    )
    return fin.groupBy((F.col("user_id") % 10).alias("user_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("peak").cast("long").alias("total_peak"),
        F.sum("final_bal").cast("long").alias("total_final"),
        F.sum("n_at_floor").cast("long").alias("floor_touches"),
    )
