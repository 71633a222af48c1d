"""salted_join: result-equivalence with the plain join + plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.skew import (
    salted_join,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
    load_table,
)

from conftest import SF_SMOKE


def test_salted_inner_join_equals_plain_join(spark):
    """A heavily-skewed synthetic left side (90% one key) joined to a dim:
    the salted join must return exactly the plain join's multiset."""
    left = spark.range(0, 2000).select(
        # 90% of rows hit nation key 7 — the hot-key shape
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 25)
        .alias("n_nationkey"),
        F.col("id").alias("row_id"),
    )
    nation = load_table(spark, SF_SMOKE, "nation")
    got = salted_join(left, nation, ["n_nationkey"], salt=8)
    plain = left.join(nation, "n_nationkey")
    assert got.count() == plain.count()
    g = {(r.row_id, r.n_name) for r in got.collect()}
    p = {(r.row_id, r.n_name) for r in plain.collect()}
    assert g == p


def test_salted_left_join_keeps_unmatched_rows(spark):
    left = spark.createDataFrame(
        [(1, "a"), (99, "b"), (99, "c")], "k long, v string"
    )
    right = spark.createDataFrame([(1, "X")], "k long, w string")
    got = salted_join(left, right, ["k"], salt=4, how="left")
    rows = {(r.k, r.v, r.w) for r in got.collect()}
    assert rows == {(1, "a", "X"), (99, "b", None), (99, "c", None)}


def test_unsupported_join_type_rejected(spark):
    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], how="full_outer")
