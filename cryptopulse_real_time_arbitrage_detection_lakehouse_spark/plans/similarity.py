"""Similarity-search queries over ``embeddings`` (ANN extension operators).

The query vector is row ``vec_id = 0`` of the same table (deterministic,
no external input). See ``functions/similarity.py`` for the exact-decimal
dot-product discipline that makes the cosine values bit-identical to the
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import (
    cosine_topk_fast,
    sign_bucket,
    sql_sign_bucket,
)
from ..sources.testdata import load_table
from .registry import register

QUERY_VEC_ID = 0
TOP_K = 10

#: element quantization scale: floor(x * 2^24) -> int64. A power-of-two
#: scale makes the multiply EXACT in every IEEE precision (it only shifts
#: the exponent — float32 vs float64 evaluation cannot differ), so floor is
#: bit-identical in Spark and DuckDB. Downstream dot/norm math is exact
#: integer arithmetic: |x| < 0.6 -> |xi| < 1e7, products < 1.1e14,
#: 64-dim sums < 7.2e15 — inside both int64 and double's exact 2^53 range.
QSCALE = float(2**24)


def _exact_cosines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, label, cosine vs query vector) for every non-query vector,
    via the quantized-integer path (order-independent, oracle-parity)."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("x", F.floor(F.col("x") * F.lit(QSCALE)))
    q = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.posexplode("embedding").alias("pos", "qx"))
        .withColumn("qx", F.floor(F.col("qx") * F.lit(QSCALE)))
    )
    joined = e.join(F.broadcast(q), "pos")
    agg = joined.groupBy("vec_id", "label").agg(
        F.sum(F.col("x") * F.col("qx")).cast("double").alias("dot"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("n2"),
    )
    qn2 = q.agg(F.sum(F.col("qx") * F.col("qx")).cast("double").alias("qn2"))
    return (
        agg.crossJoin(F.broadcast(qn2))
        .filter(F.col("vec_id") != QUERY_VEC_ID)
        .select(
            "vec_id",
            "label",
            (F.col("dot") / (F.sqrt(F.col("n2")) * F.sqrt(F.col("qn2")))).alias(
                "cosine"
            ),
        )
    )


#: embedding dimensionality (all sf dirs ship 64-dim vectors; DuckDB's
#: range() cannot take a lateral column arg, so the twin hardcodes it)
EMB_DIM = 64

_SQL_EXACT_COSINES = f"""
e AS (
  SELECT vec_id, label, r.i AS pos,
         CAST(floor(embedding[r.i] * {QSCALE!r}) AS BIGINT) AS x
  FROM embeddings, range(1, {EMB_DIM} + 1) r(i)
),
q AS (SELECT pos, x AS qx FROM e WHERE vec_id = {QUERY_VEC_ID}),
d AS (
  SELECT e.vec_id, e.label,
    CAST(SUM(e.x * q.qx) AS DOUBLE) AS dot,
    CAST(SUM(e.x * e.x) AS DOUBLE) AS n2
  FROM e JOIN q USING (pos) GROUP BY 1, 2
),
qn AS (
  SELECT CAST(SUM(qx * qx) AS DOUBLE) AS qn2
  FROM q
),
cosines AS (
  SELECT vec_id, label, dot / (sqrt(n2) * sqrt(qn2)) AS cosine
  FROM d, qn WHERE vec_id <> {QUERY_VEC_ID}
)
"""


@register(
    "sim_cosine_topk",
    oracle=f"""
WITH {_SQL_EXACT_COSINES}
SELECT vec_id, label, cosine FROM cosines
ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
""",
    doc="Brute-force cosine top-k vs the vec_id=0 query vector — the ANN "
    "correctness baseline. Exact decimal-summed dot products; "
    "TakeOrderedAndProject top-k (no global sort).",
    tags=("similarity", "topk"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _exact_cosines(spark, sf_dir)
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "sim_cosine_topk_lsh",
    oracle=f"""
WITH {_SQL_EXACT_COSINES},
b AS (SELECT vec_id, {sql_sign_bucket("embedding")} AS bucket FROM embeddings)
SELECT c.vec_id, c.label, c.cosine, b.bucket
FROM cosines c JOIN b ON c.vec_id = b.vec_id
WHERE b.bucket = (SELECT bucket FROM b WHERE vec_id = {QUERY_VEC_ID})
ORDER BY c.cosine DESC, c.vec_id LIMIT {TOP_K}
""",
    doc="LSH-bucketed ANN: sign-bit bucket (8 hyperplane signs) prunes the "
    "scan to the query's bucket (~N/256), then exact cosine rank inside. "
    "The scale path: pre-partition by bucket -> partition pruning.",
    tags=("similarity", "lsh", "topk"),
)
def sim_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    buckets = emb.select("vec_id", sign_bucket(F.col("embedding")).alias("bucket"))
    qb = buckets.filter(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("bucket").alias("qbucket")
    )
    cos = _exact_cosines(spark, sf_dir)
    return (
        cos.join(buckets, "vec_id")
        .crossJoin(F.broadcast(qb))
        .filter(F.col("bucket") == F.col("qbucket"))
        .select("vec_id", "label", "cosine", "bucket")
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "sim_cosine_topk_fast",
    oracle=None,  # NumPy summation order differs from SQL folds: no exact
    # twin. pytest cross-checks its ranking against sim_cosine_topk.
    doc="Arrow/NumPy brute-force cosine top-k (mapInPandas, per-partition "
    "local top-k) — the throughput path for the same ANN query.",
    tags=("similarity", "topk", "pandas-udf"),
)
def sim_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()[0]
    )
    return cosine_topk_fast(
        emb, list(qvec), k=TOP_K, exclude_id=QUERY_VEC_ID
    )
