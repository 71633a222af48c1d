"""Partitioning helpers: parallelism discipline for CPU-heavy stages.

A scan's partition count is byte-driven (``spark.sql.files.maxPartitionBytes``,
default 128 MB), which is right for IO-bound plans but wrong for compute-
heavy row-local stages: a 10 MB file full of documents scans as ONE split,
and a shingle/minhash/feature kernel then runs on one core of a 32-core
executor — or one executor of a 1000-executor cluster. `spread` widens such
stages to at least the cluster's parallelism; when the input is already
split wide enough (the normal case at 100 TB) it is a no-op, so the extra
exchange only exists exactly when it pays for itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(
    df: DataFrame,
    *,
    by: str | None = None,
    partitions: int | None = None,
    force: bool = False,
) -> DataFrame:
    """Ensure at least ``partitions`` (default: cluster parallelism)
    partitions before a CPU-heavy stage; no-op when already wide enough.

    ``by`` hash-distributes on a key column (keeps any later shuffle on the
    same key co-partitioned); otherwise round-robin.

    ``force=True`` repartitions even when the input is already wide, at
    width max(current, target) — for call sites where establishing the
    ``by`` clustering itself is the optimization (e.g. shuffling compact
    parent rows by key BEFORE an explode so the downstream per-key
    aggregation needs no exchange over the exploded mass; guide §2.3 /
    §3.3). A pinned width is used instead of a bare ``repartition(by)``
    because AQE would otherwise coalesce a small shuffle to one
    partition and serialize the explode it feeds.
    """
    target = partitions or df.sparkSession.sparkContext.defaultParallelism
    cur = df.rdd.getNumPartitions()
    if not force and cur >= target:
        return df
    width = max(cur, target)
    return df.repartition(width, by) if by else df.repartition(width)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    key: str,
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table hash-bucketed (and optionally
    sorted) on ``key`` — the co-located-join layout.

    Two tables bucketed on their join key with the same bucket count join
    WITHOUT any Exchange: each task zips bucket i with bucket i, so the
    fact-fact join that normally dominates shuffle volume moves zero rows
    over the network. At 100 TB this is the difference between re-shuffling
    both fact tables per query and paying the shuffle once at write time —
    the same contract as Hive/Iceberg bucketed tables. ``sort=True``
    pre-hashes to one file per bucket and sorts it; the sort-merge join
    still re-sorts in-task (Spark trusts file order only under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering``), but that sort
    is per-bucket in memory — the network shuffle is what's gone.
    """
    if sort:
        # one file per bucket: Spark only trusts a bucket's sort order when
        # the bucket is a single file, and pre-hashing on the bucket key
        # makes each write task own exactly one bucket. This is the write-
        # side shuffle the read-side joins then never pay again.
        df = df.repartition(buckets, F.col(key))
    writer = df.write.mode(mode).bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def shared(df: DataFrame, *, reliable: bool = False) -> DataFrame:
    """Compute ``df`` ONCE when the plan references it from several
    branches (self-joins, signature + verification legs of a dedup
    pipeline).

    Catalyst does not reuse subtrees across branches of one query —
    column pruning specializes each branch's copy, so an expensive
    row-local kernel (md5-per-shingle, simhash) re-runs per reference.
    An EAGER ``localCheckpoint`` materializes the rows to executor
    storage here and now; every branch then reads that one copy.

    Why eager, and why not the alternatives (both measured on
    doc_ngram_jaccard_pairs at sf0.1):
    - ``localCheckpoint(eager=False)``: inside a single action the lazy
      checkpoint gives NO cross-stage reuse — each downstream
      shuffle-map stage re-runs the full lineage (83 s vs 14 s).
    - ``persist()``: same 14 s for THIS query, but every persisted frame
      registers in the session CacheManager and is never unpersisted, so
      each subsequent query's analysis canonicalizes its whole tree
      against every cached plan — in a 50-query session (bench, the
      driver's correctness run) later queries degraded up to 70x.
    Checkpointed RDDs stay out of the CacheManager and are released by
    the ContextCleaner once the frame goes out of scope.

    Scale contract: only wrap results that are per-row REDUCTIONS of the
    input (signatures, digests, buckets — never raw documents). At 100 TB
    the same node is what a production pipeline writes to a silver table;
    this is the in-session analog.

    ``reliable=True`` swaps the executor-pinned ``localCheckpoint`` for
    a RELIABLE checkpoint into ``spark.sparkContext.getCheckpointDir()``
    (set via ``SparkContext.setCheckpointDir``, normally durable
    storage). The tradeoff: localCheckpoint stores blocks on the
    executors that computed them — fastest, but an executor LOSS makes
    the blocks unrecoverable (lineage was truncated), failing any job
    mid-flight that still references the frame; exactly what a
    10-iteration PageRank on a 1000-executor cluster must not risk, so
    the iterative plans (`plans/graph.py`) pass ``reliable=True`` and
    run reliably WHEN a checkpoint dir is configured. Without one
    (local mode, tests, the bench) they silently keep the local form —
    single-JVM executor loss means process death anyway, so paying a
    distributed-FS round-trip would buy nothing.
    """
    if reliable and df.sparkSession.sparkContext.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
