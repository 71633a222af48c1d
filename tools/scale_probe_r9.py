#!/usr/bin/env python
"""10x/100x probes for the round-9 operators.

- candle_macd kernel (`keyed_exact_macd`): axis = SERIES LENGTH per key
  (the recursion is sequential per key by design; the claim to verify
  is that wall scales ~linearly in series length and the Arrow plumbing
  does not add a superlinear term). 3 keys x {20k, 200k, 2M} rows.
- deep_clone_to: axis = FILE COUNT (rows/file pinned at 2000),
  16 -> 160 files, serial vs spark= distributed copy.
- doc_bm25_search shape: axis = DOC COUNT x10 via an unioned corpus
  (ids shifted); the postings shuffle must scale with matching
  postings, not corpus bytes.

Usage: python tools/scale_probe_r9.py
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.recursive import (  # noqa: E501
        keyed_exact_macd,
    )
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.delta import (  # noqa: E501
        DeltaTable,
    )

    print("== candle_macd kernel: series length scaling ==")
    base = None
    for n in (20_000, 200_000, 2_000_000):
        df = (
            spark.range(0, 3 * n)
            .selectExpr(
                "CAST(id % 3 AS STRING) AS symbol",
                "lpad(CAST(CAST(id / 3 AS BIGINT) AS STRING), 12, '0') AS ts",
                "CAST((id * 2654435761) % 1073741824 AS BIGINT) AS q",
            )
            .repartition(32)
        )
        df.count()  # materialize input cost outside the timing
        t0 = time.time()
        out = keyed_exact_macd(
            df, key_cols=["symbol"], order_col="ts", q_col="q"
        )
        cnt = out.count()
        w = time.time() - t0
        if base is None:
            base = w
        print(
            f"  rows/key={n:>9,}  total={cnt:>9,}  wall={w:6.1f}s  "
            f"factor={w / base:5.1f}x (rows x{3 * n // 60_000})"
        )

    print("== deep_clone_to: file-count scaling, serial vs spark= ==")
    for files in (16, 160):
        src_dir = tempfile.mkdtemp(prefix=f"cpdcsrc{files}_") + "/t"
        t = DeltaTable(src_dir)
        t.write(
            spark.range(0, 2000 * files)
            .selectExpr("id", "id * 2 AS v")
            .repartition(files)
        )
        t.delete(spark, "id % 37 = 0")  # DVs on every file
        t0 = time.time()
        t.deep_clone_to(tempfile.mkdtemp(prefix="cpdcs_") + "/c")
        serial = time.time() - t0
        t0 = time.time()
        t.deep_clone_to(tempfile.mkdtemp(prefix="cpdcd_") + "/c", spark=spark)
        dist = time.time() - t0
        print(
            f"  files={files:>4}  serial={serial:5.1f}s  "
            f"spark= {dist:5.1f}s"
        )

    print("== doc_bm25_search: corpus x10 ==")
    import __spark_entry__ as entry

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    fn = entry.queries()["doc_bm25_search"]
    t0 = time.time()
    fn(spark, sf).count()
    base_w = time.time() - t0

    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    big = docs
    for i in range(1, 10):
        big = big.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
        )
    big_dir = tempfile.mkdtemp(prefix="cpbm25_")
    big.write.parquet(os.path.join(big_dir, "documents.parquet"))
    t0 = time.time()
    fn(spark, big_dir).count()
    big_w = time.time() - t0
    print(
        f"  sf0.1={base_w:5.1f}s  x10={big_w:5.1f}s  "
        f"factor={big_w / base_w:4.1f}x"
    )


if __name__ == "__main__":
    main()
