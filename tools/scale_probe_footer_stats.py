#!/usr/bin/env python
"""Many-FILES 10x probe for the footer-stat maintenance ops (round-8
verdict item 1).

`recompute_stats` and `convert_from_parquet` cost one parquet-footer
read per file — the ops exist FOR inherited million-file foreign
tables, so the axis that matters is FILE COUNT, not data volume (the
round-7 probe scaled rows and conflated the two; its 2.7x was mostly
bigger files + the audit's predicate reads). This probe holds rows/file
constant (~200 tiny rows) and scales the number of files 10x, timing
the serial driver loop vs the distributed `spark=` pass:

- serial:      wall ~ O(files) driver I/O — expect ~10x at 10x files
- distributed: footer reads fan out across local[*] executor threads;
  expect well under 10x (bounded below by the driver-side commit build,
  which is O(files) string work but ~1000x cheaper per file than a
  footer open+parse)

Verdict = the distributed 10x factor and the distributed/serial speedup
at 10x. On a real 1000-executor cluster the distributed pass divides by
the cluster width; local[32] only shows the shape.

Usage: python tools/scale_probe_footer_stats.py [N_FILES_BASE]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.session import (  # noqa: E402
    get_spark,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.delta import (  # noqa: E402
    DeltaTable,
)

N_BASE = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ROWS_PER_FILE = 200


def build_lake(spark, n_files: int) -> str:
    d = tempfile.mkdtemp(prefix=f"cpfooter_{n_files}_") + "/lake"
    spark.range(0, n_files * ROWS_PER_FILE).selectExpr(
        "id", "id * 2 AS v", "CAST(id % 97 AS DOUBLE) AS w"
    ).repartition(n_files).write.parquet(d)
    return d


def strip_stats(table: DeltaTable) -> None:
    _meta, adds = table._snapshot_state(None)
    now_ms = int(time.time() * 1000)
    actions = [
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "FOREIGN STATLESS REWRITE",
                "operationParameters": {},
            }
        }
    ]
    for a in adds:
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": False,
                    "partitionValues": a.get("partitionValues") or {},
                    "size": a.get("size"),
                }
            }
        )
        stripped = {k: v for k, v in a.items() if k != "stats"}
        stripped["dataChange"] = False
        actions.append({"add": stripped})
    table._publish_or_conflict(
        table.latest_version() + 1, actions, "FOREIGN STATLESS REWRITE"
    )


def main() -> None:
    spark = get_spark()
    results: dict[str, dict] = {}
    for n_files in (N_BASE, N_BASE * 10):
        scale = "base" if n_files == N_BASE else "10x"
        # CONVERT: serial vs distributed on identical fresh lakes
        lake_s = build_lake(spark, n_files)
        lake_d = build_lake(spark, n_files)
        t0 = time.perf_counter()
        DeltaTable.convert_from_parquet(lake_s)
        conv_serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        DeltaTable.convert_from_parquet(lake_d, spark=spark)
        conv_dist = time.perf_counter() - t0

        # RECOMPUTE: two identical stats-less tables, serial vs spark=
        tbl_s = DeltaTable.convert_from_parquet(build_lake(spark, n_files))
        tbl_d = DeltaTable.convert_from_parquet(
            build_lake(spark, n_files), spark=spark
        )
        strip_stats(tbl_s)
        strip_stats(tbl_d)
        t0 = time.perf_counter()
        rs = tbl_s.recompute_stats()
        rec_serial = time.perf_counter() - t0
        t0 = time.perf_counter()
        rd = tbl_d.recompute_stats(spark=spark)
        rec_dist = time.perf_counter() - t0
        assert rs["updated_files"] == rd["updated_files"] == n_files
        results[scale] = {
            "n_files": n_files,
            "convert_serial_s": round(conv_serial, 2),
            "convert_distributed_s": round(conv_dist, 2),
            "recompute_serial_s": round(rec_serial, 2),
            "recompute_distributed_s": round(rec_dist, 2),
        }
        for d in (lake_s, lake_d, tbl_s.path, tbl_d.path):
            shutil.rmtree(os.path.dirname(d), ignore_errors=True)

    b, x = results["base"], results["10x"]
    summary = {
        "rows_per_file": ROWS_PER_FILE,
        **results,
        "factor_10x": {
            "convert_serial": round(
                x["convert_serial_s"] / b["convert_serial_s"], 2
            ),
            "convert_distributed": round(
                x["convert_distributed_s"] / b["convert_distributed_s"], 2
            ),
            "recompute_serial": round(
                x["recompute_serial_s"] / b["recompute_serial_s"], 2
            ),
            "recompute_distributed": round(
                x["recompute_distributed_s"] / b["recompute_distributed_s"], 2
            ),
        },
        "speedup_at_10x": {
            "convert": round(
                x["convert_serial_s"] / x["convert_distributed_s"], 2
            ),
            "recompute": round(
                x["recompute_serial_s"] / x["recompute_distributed_s"], 2
            ),
        },
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
