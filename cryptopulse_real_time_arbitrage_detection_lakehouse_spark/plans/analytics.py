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

from ..functions.determinism import SQL_SUM_DECIMAL, SUM_DECIMAL, fmt_ts, sql_fmt_ts
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
