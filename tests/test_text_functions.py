"""Unit tests for text kernels on edge-case inputs the testdata lacks."""

from __future__ import annotations

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.text import (
    shingles,
    tokens,
)


def test_shingles_short_docs_yield_empty(spark):
    """Docs with fewer than n tokens must produce an EMPTY shingle list
    (matching the DuckDB twin's range() semantics), not crash element_at
    (ADVICE r1: sequence(0, size-n) runs descending when size < n)."""
    df = spark.createDataFrame(
        [("a",), ("a b",), ("a b c",), ("a b c d",), ("",)], ["text"]
    )
    out = df.select(shingles(tokens("text")).alias("sh")).collect()
    got = [row.sh for row in out]
    assert got == [[], [], ["a b c"], ["a b c", "b c d"], []]


def test_shingles_dedupes(spark):
    df = spark.createDataFrame([("x y x y x y",)], ["text"])
    (row,) = df.select(shingles(tokens("text")).alias("sh")).collect()
    assert sorted(row.sh) == ["x y x", "y x y"]
