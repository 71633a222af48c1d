"""Loaders for the driver-generated testdata parquet (TESTDATA.md).

These are plain columnar scans — Catalyst pushes filters and prunes
columns into the parquet reader, so every query built on top of these
starts from an efficient scan (check ``PushedFilters`` / ``ReadSchema``
in ``df.explain("formatted")``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: columns stored as parquet TIMESTAMP(NANOS) — Spark 4 rejects them unless
#: read as raw longs; we convert ``nanos DIV 1000`` -> microsecond timestamp,
#: the exact truncation DuckDB applies when it reads the same file.
_NANOS_TS_COLUMNS = {"events": ("ts",)}


def sf_dir_from_env(default: str = DEFAULT_SF_DIR) -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", default)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TESTDATA_TABLES:
        raise KeyError(f"unknown testdata table {name!r}; have {TESTDATA_TABLES}")
    nanos_cols = _NANOS_TS_COLUMNS.get(name, ())
    if nanos_cols:
        # Sessions built by `session.get_spark` set this at construction;
        # this runtime set covers foreign sessions (e.g. the driver's).
        # SESSION-WIDE AND STICKY on purpose: restoring it right after this
        # call could flip the conf before the lazy scan executes. Nanos
        # arrive as raw longs, then integer-divide to microseconds (a
        # double roundtrip would lose precision above 2^53).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    for c in nanos_cols:
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} DIV 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for the SQL API)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
