"""Misra-Gries candidate pass: superset guarantee and exactness of the
two-pass pipeline regardless of partitioning."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.heavy_hitters import (
    heavy_hitter_candidates,
    heavy_hitter_summaries,
)


def _stream(spark, partitions):
    # skewed multiset: items h0/h1 are true heavy hitters, a long tail
    # of near-threshold decoys tries to crowd the summaries
    rows = (
        [("h0",)] * 400
        + [("h1",)] * 250
        + [(f"mid{i}",) for i in range(40) for _ in range(12)]
        + [(f"tail{i}",) for i in range(3000)]
    )
    return spark.createDataFrame(rows, "item string").repartition(partitions)


def test_candidates_are_superset_of_true_heavy_hitters(spark):
    df = _stream(spark, 7)
    n = df.count()
    k = 100
    cand = {
        r.item
        for r in heavy_hitter_candidates(df, col="item", capacity=k).collect()
    }
    truth = {
        r.item
        for r in df.groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * (k + 1) > n)
        .collect()
    }
    assert truth <= cand
    # and the summary did its job: candidates are bounded, not the vocab
    assert len(cand) <= 7 * k


@pytest.mark.parametrize("parts", [1, 3, 16])
def test_two_pass_answer_is_exact_and_partition_invariant(spark, parts):
    df = _stream(spark, parts)
    n = df.count()
    phi_inv = 20  # heavy = freq > n/20 (~207) -> exactly h0 and h1
    cand = heavy_hitter_candidates(df, col="item", capacity=64)
    got = {
        (r.item, r.c)
        for r in df.join(F.broadcast(cand), "item")
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") * phi_inv > n)
        .collect()
    }
    assert got == {("h0", 400), ("h1", 250)}


def test_summaries_carry_exact_partition_counts(spark):
    """The sentinel rows make the global n derivable from the summary
    relation — the thing that keeps the pipeline at two source scans."""
    df = _stream(spark, 5)
    n = df.count()
    summ = heavy_hitter_summaries(df, col="item", capacity=64).collect()
    sentinels = [r.part_n for r in summ if r.item is None]
    assert len(sentinels) == 5  # one per partition
    assert sum(sentinels) == n
    # candidate rows never carry a count; sentinel rows never an item
    assert all((r.part_n is None) != (r.item is None) for r in summ)


def test_capacity_validated(spark):
    df = spark.createDataFrame([("a",)], "item string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitter_candidates(df, col="item", capacity=0)
