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
