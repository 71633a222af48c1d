#!/usr/bin/env python
"""100x embeddings scale probe (SCALE.md round-7, mirroring the round-6
100x documents probe).

Corpus: every sf0.1 embedding x 100 copies = 200,000 vectors with
REALISTIC near-dup structure — quantized-perturbed, never verbatim
(verbatim copies digest-collapse for free, which would measure nothing):

- copies split into 25 VARIANT GROUPS of 4 per base vector;
- each group gets its own anchor = 0.25*base + 0.75*group-noise, so
  cross-group cosine lands ~0.25-0.3 (below the 0.4 near-dup
  threshold);
- the 4 members of a group sit at anchor + 0.5% member-noise — genuine
  near-dups (cosine ~0.9999) with distinct bytes, so digest-collapse
  CANNOT fold them and the LSH/verify path does real work.

All noise is hash-derived from (vec_id, coordinate), so the corpus is
deterministic. Probes (warm best-of-2 on local[32], shuffle bytes from
the Spark status REST API as completed-stage write-delta sums):

- emb_near_dup_pairs at the registered 8-bit banding AND at the 16-bit
  scale parameterization (emb_near_dup_pairs_plan band_bits=16);
- emb_semantic_dedup (adaptive K = n/300 -> 666 clusters at 100x);
- sim_cosine_topk_lsh_indexed / _ivf_indexed with the one-time index
  build charged to its own line (bench.py's accounting).

Usage: python tools/scale_probe_embeddings.py [--copies 100]
Writes nothing to the repo; paste the printed table into SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.session import (  # noqa: E402
    get_spark,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
GROUP = 4          # near-dup copies per variant group
ALPHA = 0.25       # base weight in the anchor mix (cross-group cos ~0.28)
JITTER = 0.005     # member noise around the anchor (within-group cos ~1)


def _noise(seed_col, i: int, scale: float):
    # deterministic U(-scale, scale) per (seed, coordinate)
    return (
        F.pmod(F.hash(seed_col, F.lit(i)), F.lit(20001)).cast("double")
        / 10000.0
        - 1.0
    ) * scale


def build_corpus(spark, copies: int) -> str:
    """Materialize the 100x corpus as parquet; returns its sf-style dir."""
    out_dir = tempfile.mkdtemp(prefix="emb100_")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    c = spark.range(0, copies).select(F.col("id").alias("copy"))
    x = emb.crossJoin(F.broadcast(c))
    grp = (F.col("copy") / GROUP).cast("long")
    anchor_seed = F.col("vec_id") * 1000 + grp
    member_seed = F.col("vec_id") * 1000000 + F.col("copy")
    elems = [
        (
            F.lit(ALPHA) * F.element_at(F.col("embedding"), i + 1).cast("double")
            + _noise(anchor_seed, i, 1.0 - ALPHA)
            + _noise(member_seed, i, JITTER)
        ).cast("float")
        for i in range(dim)
    ]
    x.select(
        (F.col("vec_id") * copies + F.col("copy")).alias("vec_id"),
        F.array(*elems).alias("embedding"),
        F.col("label"),
    ).repartition(32).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    return out_dir


def shuffle_bytes(spark) -> tuple[int, int]:
    """(write, read) bytes summed over COMPLETE stages via the REST API."""
    try:
        app = spark.sparkContext.applicationId
        port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1]
        url = f"http://localhost:{port}/api/v1/applications/{app}/stages?status=complete"
        stages = json.load(urllib.request.urlopen(url, timeout=10))
        return (
            sum(s.get("shuffleWriteBytes", 0) for s in stages),
            sum(s.get("shuffleReadBytes", 0) for s in stages),
        )
    except Exception as exc:  # UI disabled etc.
        print(f"  [shuffle bytes unavailable: {exc}]", file=sys.stderr)
        return (0, 0)


def timed(spark, label: str, fn, runs: int = 2) -> None:
    best, rows, delta = None, None, (0, 0)
    for _ in range(runs):
        w0, r0 = shuffle_bytes(spark)
        t0 = time.perf_counter()
        df = fn()
        n = df.count() if isinstance(df, DataFrame) else int(df)
        sec = time.perf_counter() - t0
        w1, r1 = shuffle_bytes(spark)
        if best is None or sec < best:
            best, rows, delta = sec, n, (w1 - w0, r1 - r0)
    print(
        f"{label}: {best:.2f} s, rows={rows}, "
        f"shuffle write {delta[0] / 1e9:.2f} GB / read {delta[1] / 1e9:.2f} GB"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    args = ap.parse_args()
    spark = get_spark("emb-scale-probe", ui=True)  # REST API for shuffle bytes
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans import (
        similarity as S,
    )
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (  # noqa: E501
        load_table,
    )

    t0 = time.perf_counter()
    big_dir = build_corpus(spark, args.copies)
    n = spark.read.parquet(f"{big_dir}/embeddings.parquet").count()
    print(f"corpus: {n} vectors in {time.perf_counter() - t0:.1f} s at {big_dir}")

    for sf_label, d in (("sf0.1", SF_DIR), (f"{args.copies}x", big_dir)):
        emb = load_table(spark, d, "embeddings")
        timed(
            spark,
            f"emb_near_dup_pairs[8-bit] @ {sf_label}",
            lambda: S.emb_near_dup_pairs_plan(emb),
        )
        timed(
            spark,
            f"emb_near_dup_pairs[16-bit] @ {sf_label}",
            lambda: S.emb_near_dup_pairs_plan(emb, band_bits=16),
        )
        timed(
            spark,
            f"emb_semantic_dedup @ {sf_label}",
            lambda: plans.get("emb_semantic_dedup").fn(spark, d),
        )
        for q in ("sim_cosine_topk_lsh_indexed", "sim_cosine_topk_ivf_indexed"):
            fn = plans.get(q).fn
            timed(spark, f"{q}:index_build @ {sf_label}", lambda: fn(spark, d), runs=1)
            timed(spark, f"{q}:probe @ {sf_label}", lambda: fn(spark, d))
    spark.stop()


if __name__ == "__main__":
    main()
