"""chunked_lag == plain window lag, including across empty-chunk gaps."""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.chunked_lag import (
    chunked_lag,
)


def test_matches_plain_lag_with_gaps(spark):
    # keys x sparse positions: chunk 0 -> [0,1], chunk 2 -> [20], chunk 5 -> [50,51]
    rows = [
        (k, p, float(p * 10 + ki))
        for ki, k in enumerate(["a", "b"])
        for p in (0, 1, 20, 50, 51)
    ]
    df = spark.createDataFrame(rows, "k string, pos long, v double")

    got = chunked_lag(
        df,
        key_cols=["k"],
        order_col="pos",
        value_col="v",
        chunk=F.floor(F.col("pos") / 10),
        out_col="lv",
    )
    expect = df.withColumn(
        "lv", F.lag("v").over(W.partitionBy("k").orderBy("pos"))
    )
    g = {(r.k, r.pos): r.lv for r in got.collect()}
    e = {(r.k, r.pos): r.lv for r in expect.collect()}
    assert g == e
    # sanity: the gap case really exercised the cross-chunk patch
    assert g[("a", 20)] == 10.0 and g[("a", 50)] == 200.0
    assert g[("a", 0)] is None


def test_heavy_stage_runs_per_chunk(spark):
    df = spark.range(1000).select(
        F.lit("one_key").alias("k"),
        F.col("id").alias("pos"),
        F.col("id").cast("double").alias("v"),
    )
    got = chunked_lag(
        df,
        key_cols=["k"],
        order_col="pos",
        value_col="v",
        chunk=F.floor(F.col("pos") / 100),
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the local window partitions by (key, chunk), not key alone
    assert "__chunk" in plan
