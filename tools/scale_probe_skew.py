#!/usr/bin/env python
"""Skewed-key 10x probe (SCALE.md round-7, verdict item 6).

Every prior SCALE.md probe scaled data UNIFORMLY; this one gives a
single key 90% of the rows and measures whether the aggregation paths
serialize on the hot key:

- events x10 SKEWED: 90% of rows re-keyed to user_id=42 — which also
  concentrates ~90% of ticks on ONE symbol (symbol = 'S' || user_id%3),
  so `gold_candles_1m` (hash agg on symbol x minute window) and
  `user_session_stats` (session_window agg partitioned by user_id) both
  see the hot key;
- documents x10 SKEWED: 90% of copies carry doc 0's text verbatim (one
  hot digest group + one hot language), driving
  `doc_pretrain_funnel_audit`'s exact-dedup groupBy, LSH stage, and
  language quota through the hot key.

Each query runs COLD (fresh temp sf-dir, run 1 only — the medallion
contract caches per sf_dir, and cold-vs-cold is the comparable pair)
on a uniform x10 corpus and on the skewed x10 corpus. Verdict = the
skewed/uniform wall ratio: ~1x means map-side partial aggregation (or
windowing keys finer than the hot key) absorbs the skew; >>1x means a
stage serialized.

Usage: python tools/scale_probe_skew.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.session import (  # noqa: E402
    get_spark,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (  # noqa: E402
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
HOT_FRACTION = 0.9


def _events_10x(spark, skewed: bool) -> str:
    out = tempfile.mkdtemp(prefix=f"skew_ev_{'hot' if skewed else 'uni'}_")
    ev = load_table(spark, SF_DIR, "events")  # normalizes ts encoding
    c = spark.range(0, COPIES).select(F.col("id").alias("copy"))
    x = ev.crossJoin(F.broadcast(c))
    uid = F.col("user_id")
    if skewed:
        # deterministic 90% of rows collapse onto one user (and with
        # symbol = 'S' || user_id % 3, onto one symbol)
        hot = F.pmod(F.hash("event_id", "copy"), F.lit(10)) < int(
            HOT_FRACTION * 10
        )
        uid = F.when(hot, F.lit(42)).otherwise(F.col("user_id"))
    x.select(
        (F.col("event_id") * COPIES + F.col("copy")).alias("event_id"),
        "ts",
        uid.alias("user_id"),
        "event_type",
        "value",
        "props",
    ).repartition(32).write.mode("overwrite").parquet(f"{out}/events.parquet")
    return out


def _documents_10x(spark, skewed: bool) -> str:
    out = tempfile.mkdtemp(prefix=f"skew_doc_{'hot' if skewed else 'uni'}_")
    docs = load_table(spark, SF_DIR, "documents")
    hot_row = docs.orderBy("doc_id").first()
    c = spark.range(0, COPIES).select(F.col("id").alias("copy"))
    x = docs.crossJoin(F.broadcast(c))
    text = F.concat(F.col("text"), F.lit(" c"), F.col("copy").cast("string"))
    lang = F.col("lang")
    if skewed:
        hot = F.pmod(F.hash("doc_id", "copy"), F.lit(10)) < int(
            HOT_FRACTION * 10
        )
        # hot rows: doc 0's text VERBATIM (one digest group, one lang);
        # cold rows keep their own text made unique per copy
        text = F.when(hot, F.lit(hot_row["text"])).otherwise(text)
        lang = F.when(hot, F.lit(hot_row["lang"])).otherwise(lang)
    x.select(
        (F.col("doc_id") * COPIES + F.col("copy")).alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        "source",
        F.length(text).alias("n_chars"),
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    return out


def main() -> None:
    spark = get_spark("skew-probe")
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

    dirs = {
        ("events", False): _events_10x(spark, False),
        ("events", True): _events_10x(spark, True),
        ("documents", False): _documents_10x(spark, False),
        ("documents", True): _documents_10x(spark, True),
    }
    probes = [
        ("gold_candles_1m", "events"),
        ("user_session_stats", "events"),
        ("doc_pretrain_funnel_audit", "documents"),
    ]
    for q, table in probes:
        fn = plans.get(q).fn
        times = {}
        for skewed in (False, True):
            d = dirs[(table, skewed)]
            t0 = time.perf_counter()
            n = fn(spark, d).count()
            times[skewed] = time.perf_counter() - t0
            print(
                f"{q} @ 10x {'skewed' if skewed else 'uniform'}: "
                f"{times[skewed]:.2f} s, rows={n}"
            )
        print(f"{q}: skew ratio {times[True] / times[False]:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
