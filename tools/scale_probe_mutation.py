#!/usr/bin/env python
"""100x probe for the Delta MUTATION / CDF surface (round-8 verdict
item 2 — same protocol as the round-6 documents and round-7 embeddings
100x probes, pointed at the write path).

Axis: FILE COUNT (rows/file pinned at 2000), 16 files -> 1600 files
(100x), because the mutation paths' driver work is O(touched files):
DV sidecar persistence, commit-action building, change-feed planning.
Every op uses a predicate that touches EVERY file (ids are
hash-scattered by repartition), i.e. the worst case a 100 TB
broad-predicate DELETE/UPDATE/MERGE presents.

Probed per scale, each on a fresh CDF-enabled table (cold, single run —
mutations are one-shot):

- DELETE  ~5% of rows spread across all files (every file gets a DV)
- UPDATE  ~5% of rows (DVs + replacement files + CDC images)
- MERGE   source = 5% matched updates + 1% inserts (X153 two-phase)
- read_changes over the three mutation commits (batch CDF, X216 path)
- pyds CDF stream drain over the same commits (pure-Python source)

Also reported: DV sidecar FILE count after the delete (the spec's
`offset` field exists so a commit can pack many DVs into one sidecar;
one-file-per-DV means O(files) driver PUTs on object storage).

With --mv N, additionally runs delta_incremental_mv_refresh_audit cold
on an events-xN corpus (the round-7 10x probe's construction at 100x).

Usage: python tools/scale_probe_mutation.py [--mv 100]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.session import (  # noqa: E402
    get_spark,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.delta import (  # noqa: E402
    DeltaTable,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROWS_PER_FILE = 2000
BASE_FILES = 16


def shuffle_bytes(spark) -> tuple[int, int]:
    try:
        app = spark.sparkContext.applicationId
        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
        url = (
            f"http://localhost:{port}/api/v1/applications/{app}"
            "/stages?status=complete"
        )
        stages = json.load(urllib.request.urlopen(url, timeout=10))
        return (
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(s.get("shuffleReadBytes", 0) for s in stages),
        )
    except Exception as exc:
        print(f"  [shuffle bytes unavailable: {exc}]", file=sys.stderr)
        return (0, 0)


def timed(spark, label: str, fn) -> None:
    w0, r0 = shuffle_bytes(spark)
    t0 = time.perf_counter()
    out = fn()
    sec = time.perf_counter() - t0
    w1, r1 = shuffle_bytes(spark)
    print(
        f"{label}: {sec:.2f} s, out={out}, "
        f"shuffle write {(w1 - w0) / 1e9:.2f} GB / read {(r1 - r0) / 1e9:.2f} GB"
    )


def build_table(spark, n_files: int) -> DeltaTable:
    t = DeltaTable(
        tempfile.mkdtemp(prefix=f"cpmut_{n_files}_") + "/t"
    )
    t.write(
        spark.range(0, n_files * ROWS_PER_FILE)
        .selectExpr(
            "id", "id * 3 AS v", "CAST(id % 50 AS DOUBLE) AS w"
        )
        .repartition(n_files)
    )
    t.enable_change_data_feed()
    return t


def probe_scale(spark, n_files: int) -> None:
    label = f"{n_files}f"
    t0 = time.perf_counter()
    t = build_table(spark, n_files)
    print(f"[{label}] table built in {time.perf_counter() - t0:.1f} s")
    v0 = t.latest_version()
    n = n_files * ROWS_PER_FILE

    timed(spark, f"delete[{label}]", lambda: t.delete(spark, "id % 20 = 0"))
    dv_files = len(
        glob.glob(os.path.join(t.path, "**", "deletion_vector_*.bin"),
                  recursive=True)
    )
    print(f"  DV sidecar files after delete: {dv_files}")

    timed(
        spark,
        f"update[{label}]",
        lambda: t.update(spark, "id % 20 = 1", {"v": "v + 5"}),
    )

    src = spark.range(0, n // 20).selectExpr(
        f"id * 20 + 2 AS id", "id AS nv"
    ).union(
        spark.range(n, n + n // 100).selectExpr("id", "id AS nv")
    )
    timed(
        spark,
        f"merge[{label}]",
        lambda: (
            t.merge_into(src, "target.id = source.id")
            .when_matched_update(set={"v": "source.nv"})
            .when_not_matched_insert(
                values={
                    "id": "source.id",
                    "v": "source.nv",
                    "w": "CAST(0.0 AS DOUBLE)",
                }
            )
            .execute(spark)
        ),
    )

    timed(
        spark,
        f"read_changes[{label}]",
        lambda: t.read_changes(spark, starting_version=v0 + 1).count(),
    )

    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources import (  # noqa: E501
        pyds,
    )
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.streaming.sinks import (  # noqa: E501
        drain,
        scoped_shuffle_partitions,
        start_parquet_stream,
    )

    pyds.register(spark)
    root = tempfile.mkdtemp(prefix="cpmutstream_")

    def cdf_stream():
        with scoped_shuffle_partitions(spark):
            drain(
                start_parquet_stream(
                    spark.readStream.format("pydelta")
                    .option("path", t.path)
                    .option("readChangeFeed", "true")
                    .option("startingVersion", str(v0 + 1))
                    .load(),
                    path=os.path.join(root, "out"),
                    checkpoint=os.path.join(root, "ckpt"),
                    query_name=f"mutprobe_{label}",
                )
            )
        return spark.read.parquet(os.path.join(root, "out")).count()

    timed(spark, f"pyds_cdf_stream[{label}]", cdf_stream)


def probe_mv(spark, copies: int) -> None:
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (  # noqa: E501
        load_table,
    )

    big = tempfile.mkdtemp(prefix=f"cpmv{copies}_")
    ev = load_table(spark, SF_DIR, "events")
    c = spark.range(0, copies).select(F.col("id").alias("copy"))
    ev.crossJoin(F.broadcast(c)).withColumn(
        "event_id",
        F.col("event_id") * copies + F.col("copy"),
    ).drop("copy").repartition(64).write.mode("overwrite").parquet(
        f"{big}/events.parquet"
    )
    n = spark.read.parquet(f"{big}/events.parquet").count()
    print(f"[mv] events x{copies} corpus: {n} rows")
    fn = plans.get("delta_incremental_mv_refresh_audit").fn
    timed(spark, f"mv_refresh[sf0.1]", lambda: fn(spark, SF_DIR).count())
    timed(spark, f"mv_refresh[{copies}x]", lambda: fn(spark, big).count())


def probe_skew(spark, n_files: int = 200) -> None:
    """Hot-FILE mutation skew: the table is hive-partitioned (one
    partition-value directory per file), and a MERGE source of fixed
    size targets either keys spread uniformly across every file or
    keys confined to ONE partition — the worst update-locality a
    CDC-upsert batch presents. Ratio ~1 means the two-phase merge's
    cost tracks the SOURCE, not which files it lands in; >>1 means the
    single hot file's rewrite serialized the job."""
    n = n_files * ROWS_PER_FILE

    def build():
        t = DeltaTable(tempfile.mkdtemp(prefix="cpmutskew_") + "/t")
        t.write(
            spark.range(0, n).selectExpr(
                "id", "id * 3 AS v", f"CAST(id % {n_files} AS LONG) AS p"
            ),
            partition_by=["p"],
            optimize_write=True,  # one file per partition value
        )
        return t

    n_src = n // n_files  # one hot partition's full key set (2000 rows)

    def run_merge(t, src):
        return (
            t.merge_into(src, "target.id = source.id AND target.p = source.p")
            .when_matched_update(set={"v": "source.nv"})
            .when_not_matched_insert(
                values={"id": "source.id", "v": "source.nv", "p": "source.p"}
            )
            .execute(spark)
        )

    # both sources: n_src all-MATCHED update keys — only their file
    # locality differs
    t_uni = build()
    src_uni = spark.range(0, n_src).selectExpr(
        "id", "id AS nv", f"CAST(id % {n_files} AS LONG) AS p"
    )  # spread: ~n_src/n_files keys per partition
    timed(spark, f"merge_uniform[{n_files}p]", lambda: run_merge(t_uni, src_uni))

    t_hot = build()
    src_hot = spark.range(0, n_src).selectExpr(
        f"id * {n_files} + 7 AS id", "id AS nv", "CAST(7 AS LONG) AS p"
    )  # every key inside partition p=7: one file rewritten wholesale
    timed(spark, f"merge_hot_file[{n_files}p]", lambda: run_merge(t_hot, src_hot))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mv", type=int, default=0)
    ap.add_argument("--scales", type=str, default="1,100")
    ap.add_argument("--skew", action="store_true")
    args = ap.parse_args()
    spark = get_spark("mutation-scale-probe", ui=True)
    if args.skew:
        probe_skew(spark)
    else:
        for s in (int(x) for x in args.scales.split(",")):
            probe_scale(spark, BASE_FILES * s)
    if args.mv:
        probe_mv(spark, args.mv)
    spark.stop()


if __name__ == "__main__":
    main()
