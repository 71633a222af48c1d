"""Similarity-search queries over ``embeddings`` (ANN extension operators).

The query vector is row ``vec_id = 0`` of the same table (deterministic,
no external input); fetching that single row to the driver is the one
permitted collect (it parameterizes the plan, like a literal).

All three strategies share the quantized-integer cosine discipline from
``functions/similarity.py``, so all three are bit-identical to one DuckDB
oracle:

- `sim_cosine_topk` — row-local zip_with/aggregate cosine + top-k. The
  plan is Scan -> Project(row-local) -> TakeOrderedAndProject: no explode,
  no exchange before the top-k.
- `sim_cosine_topk_lsh` — sign-bucket filter FIRST (prunes the scan to
  ~N/256), cosine only on the survivors. At 100 TB the table would be
  written partitioned by bucket, turning the filter into partition
  pruning; the compute shape is already the pruned one.
- `sim_cosine_topk_fast` — Arrow/NumPy int64-matmul path with
  per-partition local top-k (the kernel you would run for a large batch
  of query vectors at once).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import (
    QSCALE,
    cosine_topk_fast,
    dot_long,
    quantize_vector,
    quantized_elements,
    sign_bucket,
    sign_bucket_py,
    sql_sign_bucket,
)
from ..sources.testdata import load_table
from .registry import register

QUERY_VEC_ID = 0
TOP_K = 10

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

_TOPK_ORACLE = f"""
WITH {_SQL_EXACT_COSINES}
SELECT vec_id, label, cosine FROM cosines
ORDER BY cosine DESC, vec_id LIMIT {TOP_K}
"""


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    emb = load_table(spark, sf_dir, "embeddings")
    (vec,) = emb.filter(F.col("vec_id") == QUERY_VEC_ID).select("embedding").first()
    return list(vec)


def _cosine_vs_query(qvec: list[float]) -> Column:
    """Row-local cosine of the ``embedding`` column against the (quantized,
    inlined-as-literal) query vector. Exact integer math throughout:
    order-independent and bit-identical to the SQL twin."""
    q = quantize_vector(qvec)
    qn2 = float(sum(x * x for x in q))
    qarr = F.array(*[F.lit(x).cast("long") for x in q])
    xq = quantized_elements(F.col("embedding"))
    dot = dot_long(xq, qarr)
    n2 = dot_long(xq, xq)
    return dot.cast("double") / (F.sqrt(n2.cast("double")) * F.sqrt(F.lit(qn2)))


@register(
    "sim_cosine_topk",
    oracle=_TOPK_ORACLE,
    doc="Brute-force cosine top-k vs the vec_id=0 query vector — the ANN "
    "correctness baseline. Row-local zip_with/aggregate integer cosine "
    "(no explode, no pre-top-k exchange); TakeOrderedAndProject top-k.",
    tags=("similarity", "topk"),
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    qvec = _query_vector(spark, sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", "label", _cosine_vs_query(qvec).alias("cosine"))
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
    doc="LSH-bucketed ANN: the sign-bit bucket filter runs BEFORE any "
    "cosine math, so only ~N/256 vectors are scored. At 100 TB the table "
    "is bucket-partitioned and this filter is partition pruning.",
    tags=("similarity", "lsh", "topk"),
)
def sim_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    qvec = _query_vector(spark, sf_dir)
    qbucket = sign_bucket_py(qvec)
    emb = load_table(spark, sf_dir, "embeddings")
    survivors = emb.filter(F.col("vec_id") != QUERY_VEC_ID).filter(
        sign_bucket(F.col("embedding")) == F.lit(qbucket)
    )
    return (
        survivors.select(
            "vec_id",
            "label",
            _cosine_vs_query(qvec).alias("cosine"),
            F.lit(qbucket).alias("bucket"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(TOP_K)
    )


@register(
    "sim_cosine_topk_fast",
    oracle=_TOPK_ORACLE,
    doc="Arrow/NumPy brute-force cosine top-k (mapInPandas int64 matmul, "
    "per-partition local top-k). Same quantized-integer discipline as the "
    "column path, so the same oracle checks it bit-for-bit.",
    tags=("similarity", "topk", "pandas-udf"),
)
def sim_cosine_topk_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    qvec = _query_vector(spark, sf_dir)
    # No spread here: the testdata embeddings are small enough that Python
    # worker startup would dominate. At scale the scan arrives pre-split
    # and each split runs one NumPy matmul.
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_fast(emb, qvec, k=TOP_K, exclude_id=QUERY_VEC_ID)
