"""Materialized ANN indexes: persist embeddings partitioned by their
coarse cell so query-time probing is PARTITION PRUNING, not a scan.

The registered IVF/LSH queries in ``plans/similarity.py`` compute the
bucket/cell assignment inline, per query — correct, but the assignment
kernel re-runs on the full table every time. A vector store amortizes
that: the "index build" runs once, writing the table hive-partitioned by
cell (IVF) or sign-bucket (LSH); every query then reads only its probed
partitions. Spark's planner resolves the ``cell IN (...)`` filter against
the partition directory values at planning time, so the files of
unprobed cells are never listed in the scan — at 100 TB a ``nprobe=4 /
ncentroids=16`` probe touches ~1/4 of the table's files and the other 3/4
cost nothing, not even footer reads (asserted by the plan-quality test on
``PartitionFilters`` + ``inputFiles``).

Build cost: one pass over the table (row-local assignment — the centroid
literals travel with the plan) plus the partitioned write's shuffle-free
dynamic-partition insert. The layout is plain hive-partitioned parquet,
so any engine (DuckDB included) can read it back, and the Delta client in
``sources/delta.py`` could commit the same files with partitionValues for
ACID visibility.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.similarity import ivf_cell_column, sign_bucket


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: dict[int, Sequence[float]],
    *,
    emb_col: str = "embedding",
) -> None:
    """Build the IVF index: assign every vector its nearest-centroid cell
    (row-local, exact quantized cosine) and persist partitioned by cell."""
    indexed = embeddings.withColumn(
        "cell", ivf_cell_column(centroids, F.col(emb_col))
    )
    # Co-partition by cell before the dynamic-partition insert: without
    # it every input task writes one file into EVERY cell directory it
    # sees — tasks x cells tiny files (measured 19x slower at sf0.1).
    # With it, each cell's rows land in one task -> one file per cell.
    # At 100 TB, hot cells wanting multiple files would repartition on
    # (cell, salt) instead.
    indexed.repartition(F.col("cell")).write.mode("errorifexists").partitionBy(
        "cell"
    ).parquet(path)


def read_ivf_cells(
    spark: SparkSession, path: str, cells: Sequence[int]
) -> DataFrame:
    """Probe: read ONLY the given cells (planning-time partition pruning)."""
    return spark.read.parquet(path).filter(F.col("cell").isin(*cells))


def write_lsh_index(
    embeddings: DataFrame,
    path: str,
    *,
    bits: int = 8,
    emb_col: str = "embedding",
) -> None:
    """Build the sign-bucket LSH index, partitioned by bucket (2^bits
    directories; each query probes exactly one)."""
    indexed = embeddings.withColumn(
        "bucket", sign_bucket(F.col(emb_col), bits).cast("int")
    )
    # same co-partitioning rationale as write_ivf_index
    indexed.repartition(F.col("bucket")).write.mode("errorifexists").partitionBy(
        "bucket"
    ).parquet(path)


def read_lsh_bucket(spark: SparkSession, path: str, bucket: int) -> DataFrame:
    """Probe: read the query's single bucket partition."""
    return spark.read.parquet(path).filter(F.col("bucket") == bucket)


def write_ivfpq_index(coded: DataFrame, path: str) -> None:
    """Build the IVF-PQ index (FAISS's IndexIVFPQ shape, both halves of
    the classic recipe at once): ``coded`` holds per-vector PQ code
    columns (c0..c7, one byte of information each) plus the coarse
    ``cell`` — and NOT the embedding. That omission is the index: 64
    float dims collapse to 8 codes (the 64× memory/bandwidth cut), and
    the hive partition on ``cell`` makes a probe read nprobe/ncentroids
    of the files. Queries never touch raw vectors; exact re-ranking, if
    wanted, joins the short list back to the source table by vec_id."""
    coded.repartition(F.col("cell")).write.mode("errorifexists").partitionBy(
        "cell"
    ).parquet(path)


def append_ivf_index(
    embeddings: DataFrame,
    path: str,
    centroids: dict[int, Sequence[float]],
    *,
    emb_col: str = "embedding",
) -> None:
    """INCREMENTAL index maintenance: assign the NEW vectors their
    nearest-centroid cells (same exact quantized cosine as the build)
    and append into the existing hive layout — no rebuild, no touch of
    resident files (parquet files are immutable; an append adds files
    inside the affected cell directories only). The physical contract
    that makes this exact: cell membership is a pure function of
    (vector, centroids), so build-then-append and build-all-at-once
    produce identical cell CONTENTS — only file counts differ, which
    probes never observe. Centroids must be the build's centroids;
    re-clustering is a rebuild by definition."""
    indexed = embeddings.withColumn(
        "cell", ivf_cell_column(centroids, F.col(emb_col))
    )
    indexed.repartition(F.col("cell")).write.mode("append").partitionBy(
        "cell"
    ).parquet(path)
