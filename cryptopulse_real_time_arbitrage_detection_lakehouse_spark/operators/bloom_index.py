"""Materialized Bloom filter: the persistent form of incremental
corpus-admission dedup.

The inline audit (`plans/text.py::doc_bloom_dedup_audit`) re-derives the
filter from the corpus on every run; a production pipeline builds it
ONCE and probes every arriving batch against the stored bits — daily
admission then never re-reads the corpus at all. Build: one pass over
the corpus's content digests sets k salted-hash bit positions each;
map-side distinct collapse bounds the build shuffle at m rows however
many digests the corpus holds, and the stored filter is one tiny
parquet file of <= m positions (65536 longs ~ a few hundred KB — the
whole index broadcasts). Probe: each distinct batch digest recomputes
its k positions and broadcast-joins the bits; member = all k set. Bloom
guarantees ZERO false negatives, so "not flagged" admits outright and
only flagged rows pay an exact digest recheck against the corpus.

Layout is plain parquet, readable by any engine (the DuckDB oracle
recomputes the same bits from the same salted md5), and the Delta
client could commit the file for ACID refresh; rebuilds are cheap
enough (O(corpus scan), O(m) output) that the filter is replaced, not
mutated — Bloom filters do not support deletion anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "bloom_position",
    "bloom_positions",
    "write_bloom_bits",
    "read_bloom_bits",
    "digest_membership",
]


def bloom_position(digest: Column, d: int, m: int) -> Column:
    """Bit position d in [0, m) for a content digest — first 32 bits of
    a salted md5, mod m. Bit-identical in DuckDB:
    ``CAST(('0x' || substring(md5('bf{d}:' || digest), 1, 8)) AS BIGINT)
    % m``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"bf{d}:"), digest)), 1, 8),
            16,
            10,
        ).cast("long")
        % m
    )


def bloom_positions(
    df: DataFrame, digest_col: str, *, m: int, k: int
) -> DataFrame:
    """``df`` with each row exploded to its k (digest, pos) rows."""
    return df.select(
        "*",
        F.explode(
            F.array(
                *[bloom_position(F.col(digest_col), d, m) for d in range(k)]
            )
        ).alias("pos"),
    )


def write_bloom_bits(
    corpus_digests: DataFrame, path: str, *, m: int, k: int,
    digest_col: str = "digest",
) -> None:
    """Build the filter: distinct set positions of every corpus digest,
    persisted as ONE parquet file (the filter is <= m rows by
    construction — coalesce(1) cannot concentrate more than that)."""
    (
        bloom_positions(
            corpus_digests.select(digest_col), digest_col, m=m, k=k
        )
        .select("pos")
        .distinct()
        .coalesce(1)
        .write.mode("errorifexists")
        .parquet(path)
    )


def read_bloom_bits(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def digest_membership(
    digests: DataFrame, bits: DataFrame, *, m: int, k: int,
    digest_col: str = "digest",
) -> DataFrame:
    """Membership verdict per DISTINCT digest (membership is a function
    of the digest alone — callers join the verdict back onto rows):
    ``(digest, bloom_member)`` with member = every one of the k
    positions set. The bits side broadcasts (<= m rows); the digest
    side never shuffles."""
    probed = bloom_positions(
        digests.select(digest_col).distinct(), digest_col, m=m, k=k
    )
    return (
        probed.join(
            F.broadcast(bits.withColumn("__hit", F.lit(1))),
            "pos",
            "left_outer",
        )
        .groupBy(digest_col)
        .agg(
            F.min(F.coalesce(F.col("__hit"), F.lit(0))).alias(
                "bloom_member"
            )
        )
    )
