"""Embedding similarity-search kernels.

Two execution paths (SURVEY.md section 4.3 / north-star extension ops):

- **Exact path** (oracle-checkable): posexplode the vector, join the
  broadcast query vector on position, quantize each element to int64 via
  ``floor(x * 2^24)`` (a power-of-two scale is EXACT in every IEEE
  precision — float32 vs float64 evaluation cannot differ, unlike a 1e7
  scale where products straddling an integer boundary floor differently),
  then do ALL dot/norm arithmetic in exact integer math so sums are
  order-independent and bit-identical to the DuckDB twin. The ~6e-8
  quantization shifts cosines by ~1e-6 — irrelevant for ranking, applied
  identically on both sides.
- **Fast path** (``cosine_topk_fast``): Arrow-batched ``mapInPandas`` with
  NumPy matrix math — the per-partition brute-force kernel you would run at
  scale, with per-partition local top-k so only ``k x partitions`` rows
  reach the final global top-k. No oracle (summation order differs); the
  driver records a rows-only check and the pytest suite cross-checks its
  ranking against the exact path.

Scale notes: brute-force ANN is a scan, embarrassingly parallel; the
LSH-bucketed variant (sign-bit bucketing in ``plans/similarity.py``)
prunes the scan to one bucket ~ N/2^bits of the data. At 100 TB you would
pre-partition the table by bucket so the probe prunes partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def sign_bucket(emb_col, bits: int = 8):
    """Sign-bit LSH bucket id from the first ``bits`` vector coordinates
    (coordinate-sign random-hyperplane family; deterministic and
    SQL-expressible in both engines)."""
    out = None
    for i in range(bits):
        bit = F.when(F.element_at(emb_col, i + 1) > 0, F.lit(2**i)).otherwise(F.lit(0))
        out = bit if out is None else out + bit
    return out


def sql_sign_bucket(emb_expr: str, bits: int = 8) -> str:
    terms = " + ".join(
        f"(CASE WHEN ({emb_expr})[{i + 1}] > 0 THEN {2**i} ELSE 0 END)"
        for i in range(bits)
    )
    return f"({terms})"


def cosine_topk_fast(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    exclude_id: int | None = None,
) -> DataFrame:
    """Arrow-vectorized brute-force cosine top-k (the bench fast path).

    Each partition computes cosines for its batch with one NumPy matmul and
    emits only its local top-k; the global top-k then sorts
    ``k x num_partitions`` rows — no full-result shuffle.
    """
    import numpy as np

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = np.stack(pdf[emb_col].to_numpy()).astype(np.float64)
            dots = m @ q
            norms = np.sqrt((m * m).sum(axis=1))
            cos = dots / (norms * qn)
            out = pd.DataFrame({id_col: pdf[id_col], "cosine": cos})
            if exclude_id is not None:
                out = out[out[id_col] != exclude_id]
            yield out.nlargest(min(k, len(out)), "cosine")

    local = embeddings.select(id_col, emb_col).mapInPandas(
        part, schema=f"{id_col} long, cosine double"
    )
    return local.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)
