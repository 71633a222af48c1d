"""Embedding similarity-search kernels.

Everything here is built on ONE numeric discipline: quantize each vector
element to int64 via ``floor(x * 2^24)`` and do all dot/norm arithmetic in
exact integer math. A power-of-two scale is EXACT in IEEE arithmetic (the
multiply only shifts the exponent), so Spark SQL, NumPy, Python and DuckDB
all floor the same doubles to the same integers; integer sums are
order-independent, so every execution strategy produces bit-identical
cosines and they all share one DuckDB oracle. Bounds (testdata |x| < 0.6):
|xi| < 1e7, products < 1.1e14, 64-dim sums < 7.2e15 — inside int64 AND
inside double's exact 2^53 window. The ~6e-8 quantization shifts cosines
by ~1e-6, irrelevant for ranking and applied identically on all sides.

Execution strategies (SURVEY.md section 4.3 / north-star extension ops):

- **Row-local column path** (`quantized_elements` + `dot_long`): the whole
  cosine is a per-row ``zip_with``+``aggregate`` expression — no explode,
  no shuffle; the only exchange in a top-k query is the final
  TakeOrderedAndProject. This is the primary plan.
- **Arrow/NumPy path** (`cosine_topk_fast`): ``mapInPandas`` int64 matmul
  with per-partition local top-k, so only ``k x partitions`` rows reach
  the global top-k. Same integers, same cosines — oracle-checkable.

Scale notes: brute-force ANN is a scan, embarrassingly parallel. The
LSH-bucketed variant (`sign_bucket`) prunes the scan to one bucket
~ N/2^bits BEFORE any cosine math; at 100 TB you would partition the
table by bucket so the filter becomes partition pruning.
"""

from __future__ import annotations

import math
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: element quantization scale: floor(x * 2^24) -> int64 (see module doc).
QSCALE = float(2**24)


def quantize_vector(vec: Sequence[float]) -> list[int]:
    """Driver-side twin of `quantized_elements` (same IEEE doubles in,
    same integers out — the power-of-two multiply cannot round)."""
    return [math.floor(v * QSCALE) for v in vec]


def quantized_elements(emb_col: Column) -> Column:
    """array<double> -> array<long> of floor(x * 2^24), row-local."""
    return F.transform(emb_col, lambda x: F.floor(x * F.lit(QSCALE)))


def dot_long(a: Column, b: Column) -> Column:
    """Exact int64 dot product of two array<long> columns, row-local
    (zip_with + aggregate: stays inside whole-stage codegen, no shuffle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def sign_bucket(emb_col, bits: int = 8, offset: int = 0):
    """Sign-bit LSH bucket id from ``bits`` vector coordinates starting at
    ``offset`` (coordinate-sign random-hyperplane family; deterministic and
    SQL-expressible in both engines). Different offsets give the
    independent bands of a multi-probe / banded LSH scheme."""
    out = None
    for i in range(bits):
        bit = F.when(
            F.element_at(emb_col, offset + i + 1) > 0, F.lit(2**i)
        ).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out


def sign_bucket_py(vec: Sequence[float], bits: int = 8, offset: int = 0) -> int:
    """Driver-side twin of `sign_bucket` for the (collected) query vector."""
    return sum(2**i for i in range(bits) if vec[offset + i] > 0)


def sql_sign_bucket(emb_expr: str, bits: int = 8, offset: int = 0) -> str:
    terms = " + ".join(
        f"(CASE WHEN ({emb_expr})[{offset + i + 1}] > 0 THEN {2**i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def ivf_cell_column(
    centroids: dict[int, Sequence[float]], emb_col: Column | None = None
) -> Column:
    """Nearest-centroid cell id for each row — the IVF coarse assignment,
    entirely row-local (the centroids are inlined as literals).

    Per centroid the exact quantized cosine is computed against the row's
    embedding; the argmax is taken with ``array_max`` over (cosine, -cid)
    structs so ties resolve to the least centroid id — the same rule the
    DuckDB oracle's ``row_number() OVER (ORDER BY ccos DESC, cid)`` uses.

    The quantize transform is bind()-materialized as a lambda value, so
    the 16 centroid dots (and the norm) read it for free instead of
    re-running the per-element floor transform once per reference.
    """
    from .expr import bind

    def cell_of(xq: Column) -> Column:
        n2x = dot_long(xq, xq).cast("double")
        entries = []
        for cid in sorted(centroids):
            cq = quantize_vector(centroids[cid])
            cn2 = float(sum(v * v for v in cq))
            carr = F.array(*[F.lit(v).cast("long") for v in cq])
            ccos = dot_long(xq, carr).cast("double") / (
                F.sqrt(n2x) * F.sqrt(F.lit(cn2))
            )
            # struct orders by (cosine, -cid): max = best, ties -> least cid
            entries.append(F.struct(ccos.alias("c"), F.lit(-cid).alias("negid")))
        return (-F.array_max(F.array(*entries)).getField("negid")).cast("int")

    return bind(
        quantized_elements(emb_col if emb_col is not None else F.col("embedding")),
        cell_of,
    )


def ivf_probe_cells(
    centroids: dict[int, Sequence[float]], query_vec: Sequence[float], nprobe: int
) -> list[int]:
    """The ``nprobe`` centroid cells nearest the query vector (driver-side
    twin of `ivf_cell_column`'s ranking, same quantized math + tiebreak)."""
    q = quantize_vector(query_vec)
    qn2 = float(sum(x * x for x in q))

    def cos(vec: Sequence[float]) -> float:
        c = quantize_vector(vec)
        dot = sum(a * b for a, b in zip(c, q))
        n2 = float(sum(a * a for a in c))
        return float(dot) / (math.sqrt(n2) * math.sqrt(qn2))

    ranked = sorted(
        ((cid, cos(v)) for cid, v in centroids.items()),
        key=lambda t: (-t[1], t[0]),
    )
    return [cid for cid, _ in ranked[:nprobe]]


def cosine_topk_fast(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str | None = "label",
    exclude_id: int | None = None,
) -> DataFrame:
    """Arrow-vectorized brute-force cosine top-k (the throughput path).

    Each partition quantizes its batch and computes all dots with one int64
    matmul, then emits only its local top-k (deterministically tie-broken
    by id); the global top-k sorts ``k x num_partitions`` rows — no
    full-result shuffle. Exact integer math means the result is
    bit-identical to the row-local column path and the DuckDB oracle.
    """
    import numpy as np

    q = np.asarray(quantize_vector(query_vec), dtype=np.int64)
    qn = math.sqrt(float((q * q).sum()))  # < 2^53: exact in int64 and double
    keep = [id_col] + ([label_col] if label_col else [])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            mq = np.floor(m * QSCALE).astype(np.int64)
            dots = mq @ q  # exact: bounded int64 products/sums
            n2 = (mq * mq).sum(axis=1)
            cos = dots.astype(np.float64) / (np.sqrt(n2.astype(np.float64)) * qn)
            out = pd.DataFrame({c: pdf[c] for c in keep})
            out["cosine"] = cos
            if exclude_id is not None:
                out = out[out[id_col] != exclude_id]
            yield out.sort_values(
                ["cosine", id_col], ascending=[False, True]
            ).head(min(k, len(out)))

    from pyspark.sql import types as T

    in_fields = {f.name: f for f in embeddings.schema.fields}
    schema = T.StructType(
        [T.StructField(c, in_fields[c].dataType) for c in keep]
        + [T.StructField("cosine", T.DoubleType())]
    )
    local = embeddings.select(*keep, emb_col).mapInPandas(part, schema=schema)
    return local.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


#: row-block size for the blocked Gram products below: caps the in-flight
#: cosine block at block x |group| doubles so per-task memory stays
#:  O(|group|) regardless of group size (the groups themselves are bounded
#: by the callers' cell/cluster-size contracts).
_GRAM_BLOCK = 1024


def _int64_matrix(col) -> "object":
    """pandas Series of array<long> -> (n, dim) int64 ndarray."""
    import numpy as np

    return np.asarray([np.asarray(a, dtype=np.int64) for a in col])


def gram_threshold_pairs(
    left: DataFrame,
    right: DataFrame,
    *,
    tau: float,
) -> DataFrame:
    """All cross pairs with exact quantized cosine >= ``tau`` between the
    ``left`` and ``right`` legs of a cell-pair candidate join, scored as
    per-group int64 Gram products (guide §4.2: hand whole batches to
    vectorized native code) instead of one interpreted
    ``zip_with``+``aggregate`` expression per candidate pair.

    The left input carries ``(ca, cb, dig_a, id_a, qx_a, n2_a)`` and the
    right ``(ca, cb, dig_b, id_b, qx_b, n2_b)`` — suffixed names (and
    therefore fresh attribute ids) because both legs derive from ONE
    checkpointed frame and Spark's ambiguous-self-join detection rejects
    a cogroup whose sides share attributes. ``(ca, cb)`` is the
    surviving cell pair the row was replicated into (left rows belong to
    cell ``ca``, right rows to cell ``cb``). For
    each cogrouped cell pair the kernel computes ``Xa @ Xb.T`` in int64
    (exact — the module-doc bounds keep 64-dim dots < 2^53, inside both
    int64 and double) and divides by the same ``sqrt(double(n2))`` norms
    the column expression used, so every kept cosine is bit-identical.

    Pair dedup: every unordered pair appears in both (i, j) and (j, i)
    cell groups (the caller's bound is symmetric), so exactly one
    ordering is kept via ``id_a < id_b`` on the representative ids — a
    strict total order over digests (one rep id per digest), equivalent
    to the previous ``dig_a < dig_b`` filter in WHICH pairs survive: the
    downstream expansion re-orders members with least/greatest anyway.
    Self-pairs (same digest) are excluded by the strict inequality.

    Scale: one task per surviving cell pair; per-task memory is one
    cell's rep matrix plus a ``_GRAM_BLOCK x |cb|`` cosine block (cells
    bound per-task memory by construction — the same contract the
    radii/bound design already states). Output rows are only the pairs
    above ``tau``.
    """
    import numpy as np

    def kernel(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "dig_a": pd.Series(dtype=object),
                "dig_b": pd.Series(dtype=object),
                "cosine": pd.Series(dtype="float64"),
            }
        )
        if not len(lpdf) or not len(rpdf):
            return empty
        xa = _int64_matrix(lpdf["qx_a"])
        xb = _int64_matrix(rpdf["qx_b"])
        na = np.sqrt(lpdf["n2_a"].to_numpy(dtype=np.int64).astype(np.float64))
        nb = np.sqrt(rpdf["n2_b"].to_numpy(dtype=np.int64).astype(np.float64))
        ia = lpdf["id_a"].to_numpy(dtype=np.int64)
        ib = rpdf["id_b"].to_numpy(dtype=np.int64)
        da = lpdf["dig_a"].to_numpy()
        db = rpdf["dig_b"].to_numpy()
        frames = []
        for s in range(0, len(xa), _GRAM_BLOCK):
            e = min(s + _GRAM_BLOCK, len(xa))
            dots = xa[s:e] @ xb.T  # exact int64
            cos = dots.astype(np.float64) / (na[s:e, None] * nb[None, :])
            keep = (cos >= tau) & (ia[s:e, None] < ib[None, :])
            li, rj = np.nonzero(keep)
            if len(li):
                frames.append(
                    pd.DataFrame(
                        {
                            "dig_a": da[s + li],
                            "dig_b": db[rj],
                            "cosine": cos[li, rj],
                        }
                    )
                )
        return pd.concat(frames) if frames else empty

    return (
        left.groupBy("ca", "cb")
        .cogroup(right.groupBy("ca", "cb"))
        .applyInPandas(kernel, "dig_a string, dig_b string, cosine double")
    )


def semdedup_removed_ids(
    m: DataFrame,
    *,
    eps: float,
    parallelism: int | None = None,
) -> DataFrame:
    """SemDeDup's removed set — every vector with a within-cluster
    neighbour at cosine >= ``eps`` that dominates it under the keeper
    rule (neighbour closer to the centroid, ties to the smaller id) —
    computed as one per-cluster int64 Gram product instead of a
    cluster self-join scoring each pair with an interpreted
    ``zip_with``+``aggregate`` expression (guide §4.2).

    ``m`` must carry ``(vec_id, cluster, qx, n2x, cosc)``. Rows are
    hash-partitioned by cluster and sorted within partitions so each
    cluster arrives contiguous; the kernel buffers ONE cluster at a time
    across Arrow batches (cluster sizes are bounded by the caller's
    K ~ n / target contract) and emits the removed ``vec_id``s. Each
    vector belongs to exactly one cluster and each cluster is flushed
    exactly once, so the output needs no distinct. Cosines are
    ``double(int64 dot) / (sqrt(double(n2_i)) * sqrt(double(n2_j)))`` —
    the identical IEEE expression the column form evaluated, so the
    ``>= eps`` verdicts are bit-identical. The self-pair drops out
    structurally: a row never dominates itself (equal cosc, equal id).
    """
    import numpy as np

    width = max(
        parallelism or m.sparkSession.sparkContext.defaultParallelism,
        m.rdd.getNumPartitions(),
    )

    def kernel(batches):
        buf: list[pd.DataFrame] = []
        cur = None

        def flush():
            if not buf:
                return None
            g = pd.concat(buf) if len(buf) > 1 else buf[0]
            x = _int64_matrix(g["qx"])
            n2 = g["n2x"].to_numpy(dtype=np.int64)
            norm = np.sqrt(n2.astype(np.float64))
            ci = g["cosc"].to_numpy(dtype=np.float64)
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            removed = np.zeros(len(x), dtype=bool)
            for s in range(0, len(x), _GRAM_BLOCK):
                e = min(s + _GRAM_BLOCK, len(x))
                dots = x[s:e] @ x.T  # exact int64
                cos = dots.astype(np.float64) / (norm[s:e, None] * norm[None, :])
                dom = (ci[None, :] < ci[s:e, None]) | (
                    (ci[None, :] == ci[s:e, None])
                    & (ids[None, :] < ids[s:e, None])
                )
                removed[s:e] = ((cos >= eps) & dom).any(axis=1)
            out = ids[removed]
            return pd.DataFrame({"rm_id": out}) if len(out) else None

        for pdf in batches:
            if not len(pdf):
                continue
            # split the batch at cluster boundaries; flush completed runs
            cl = pdf["cluster"].to_numpy()
            starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
            bounds = np.r_[starts, len(cl)]
            for i in range(len(starts)):
                run = pdf.iloc[bounds[i] : bounds[i + 1]]
                key = cl[bounds[i]]
                if cur is not None and key != cur:
                    res = flush()
                    if res is not None:
                        yield res
                    buf.clear()
                cur = key
                buf.append(run)
        res = flush()
        if res is not None:
            yield res

    return (
        m.select("vec_id", "cluster", "qx", "n2x", "cosc")
        .repartition(width, "cluster")
        .sortWithinPartitions("cluster")
        .mapInPandas(kernel, "rm_id long")
    )


def cosine_topk_batch(
    embeddings: DataFrame,
    queries: dict[int, Sequence[float]],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str | None = "label",
) -> DataFrame:
    """Brute-force cosine top-k for a BATCH of query vectors in one scan.

    The training-pipeline shape: score every corpus vector against all
    ``nq`` queries with a single int64 matmul per Arrow batch
    ``(batch x dim) @ (dim x nq)``, keep each partition's local top-k per
    query, and resolve the global per-query top-k with one window over
    ``k x nq x partitions`` rows. One scan total for the whole query set —
    vs ``nq`` scans of the single-query kernel. Same quantized-integer
    discipline, so bit-identical to the DuckDB oracle.

    A query vector never matches itself (``vec_id != query_id``), mirroring
    the single-query kernels.
    """
    import numpy as np

    from pyspark.sql import Window
    from pyspark.sql import types as T

    qids = sorted(queries)
    qm = np.stack(
        [np.asarray(quantize_vector(queries[qid]), dtype=np.int64) for qid in qids]
    )  # (nq, dim)
    qnorm = np.sqrt((qm * qm).sum(axis=1).astype(np.float64))
    keep = [id_col] + ([label_col] if label_col else [])

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            mq = np.floor(m * QSCALE).astype(np.int64)
            dots = mq @ qm.T  # (n, nq); exact int64 per module bounds
            n2 = (mq * mq).sum(axis=1)
            norm = np.sqrt(n2.astype(np.float64))
            cos = dots.astype(np.float64) / (norm[:, None] * qnorm[None, :])
            frames = []
            for j, qid in enumerate(qids):
                out = pd.DataFrame({c: pdf[c] for c in keep})
                out["query_id"] = qid
                out["cosine"] = cos[:, j]
                out = out[out[id_col] != qid]
                frames.append(
                    out.sort_values(
                        ["cosine", id_col], ascending=[False, True]
                    ).head(min(k, len(out)))
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                columns=keep + ["query_id", "cosine"]
            )

    in_fields = {f.name: f for f in embeddings.schema.fields}
    schema = T.StructType(
        [T.StructField(c, in_fields[c].dataType) for c in keep]
        + [
            T.StructField("query_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )
    local = embeddings.select(*keep, emb_col).mapInPandas(part, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        local.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, *([label_col] if label_col else []), "cosine", "rank")
    )
