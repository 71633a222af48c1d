"""Deduplication operators.

The reference README claims silver-layer dedup but ships none
(``README.md:123`` vs ``src/jobs/process_silver.py:76-124`` — SURVEY.md
section 0.1). These are the real thing, deterministic by construction:

- `dedup_exact`: keep one row per key set, chosen by an explicit ordering
  (never ``dropDuplicates``, whose survivor is arrival-order-dependent).
- `dedup_exact_hash`: exact content dedup via a stable digest of selected
  columns — the 100 TB pattern where the dedup key is wide text: hash
  first, shuffle the 16-byte digest, not the payload.

Streaming twin: ``dropDuplicatesWithinWatermark`` (see streaming module);
batch/oracle path uses these.

Scale notes: one shuffle on the dedup key. For skewed keys the
window-function form below keeps partial ordering local (rank within
partition after hash exchange); AQE splits oversized partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def dedup_exact(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``, the first under ``order_by``.

    Deterministic replacement for ``dropDuplicates(keys)`` — pass a total
    order (e.g. event time + unique id) so the survivor is well-defined.
    """
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def content_digest(cols: Sequence[str], sep: str = "\x1f") -> Column:
    """Stable cross-engine digest of column contents (md5 over a
    separator-joined rendering; DuckDB twin: ``md5(concat_ws(...))``)."""
    return F.md5(F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]))


def dedup_exact_hash(
    df: DataFrame,
    content_cols: Sequence[str],
    order_by: Sequence[Column | str],
    digest_col: str = "content_hash",
) -> DataFrame:
    """Exact content dedup: digest the content columns, keep the first row
    per digest under ``order_by``. The shuffle key is the digest, so at
    100 TB the exchange carries hashes + row ids, not documents."""
    with_digest = df.withColumn(digest_col, content_digest(content_cols))
    return dedup_exact(with_digest, [digest_col], order_by)
