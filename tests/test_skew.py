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


def test_salted_join_splits_hot_key_across_tasks(spark):
    """The point of salting: the hot key's rows must land on MULTIPLE
    shuffle tasks (the plain shuffled join puts them all on one). Forced
    to a shuffle join (broadcast off, AQE off) so spark_partition_id
    reflects the join's hash partitioning on the (possibly salted) key."""
    left = spark.range(0, 2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7))
        .otherwise(F.col("id") % 25)
        .alias("n_nationkey"),
        F.col("id").alias("row_id"),
    )
    nation = load_table(spark, SF_SMOKE, "nation")
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        hot_parts = (
            salted_join(left, nation, ["n_nationkey"], salt=8)
            .filter(F.col("n_nationkey") == 7)
            .groupBy(F.spark_partition_id().alias("pid"))
            .count()
            .collect()
        )
        assert len(hot_parts) > 1, hot_parts  # spread over several tasks
        total = sum(r["count"] for r in hot_parts)
        assert max(r["count"] for r in hot_parts) < total  # none owns it all
        # control: the UNSALTED shuffle join concentrates the hot key's
        # 1800 rows in exactly one task — the pathology salting removes
        plain_parts = (
            left.join(nation, "n_nationkey")
            .filter(F.col("n_nationkey") == 7)
            .select(F.spark_partition_id().alias("pid"))
            .distinct()
            .count()
        )
        assert plain_parts == 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_fuzzy_blocking_spreads_dominant_first_token(spark):
    """Zipfian guard for fuzzy matching: a corpus where EVERY name shares
    one first token must still spread the blocked self-join across >1
    shuffle task — the (tok1, length-band) composite key splits the hot
    token block by its length bands. Also pins losslessness: the banded
    join finds exactly the pairs the unbanded tok1 join finds."""
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.relational import (
        fuzzy_name_matches,
    )

    # one dominant first token, name lengths spanning many 5-char bands
    names = spark.range(0, 400).select(
        F.concat(
            F.lit("acme "),
            F.expr("repeat('x', CAST(id % 40 AS INT))"),
            F.lit("-"),
            F.col("id").cast("string"),
        ).alias("name")
    )
    old_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        got = fuzzy_name_matches(names, name_col="name", max_distance=4)
        parts = (
            got.select(F.spark_partition_id().alias("pid")).distinct().count()
        )
        assert parts > 1, "hot first-token block still lands on one task"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_bc)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
    # losslessness vs the unbanded tok1 block (small input, exact compare)
    p = names.groupBy("name").count().select(
        F.col("name"),
        F.split("name", " ").getItem(0).alias("tok1"),
    )
    a = p.select(F.col("name").alias("name_a"), "tok1")
    b = p.select(F.col("name").alias("name_b"), "tok1")
    ref = (
        a.join(b, "tok1")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(F.levenshtein("name_a", "name_b") <= 4)
        .select("name_a", "name_b")
    )
    got_pairs = {(r.name_a, r.name_b) for r in got.collect()}
    ref_pairs = {(r.name_a, r.name_b) for r in ref.collect()}
    assert got_pairs == ref_pairs and len(ref_pairs) > 0
