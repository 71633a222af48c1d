"""Z-order clustered writes: the layout must actually deliver multi-column
data skipping — per-file min/max ranges for BOTH interleaved key columns
far narrower than a round-robin layout — and the Morton code itself must
match a bit-twiddling reference."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.zorder import (
    ZORDER_BITS,
    interleave,
    with_zvalue,
    zorder_write,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
    load_table,
)

from conftest import SF_ORACLE, SF_SMOKE


def interleave_py(a: int, b: int, bits: int = ZORDER_BITS) -> int:
    a, b = a % (1 << bits), b % (1 << bits)
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def file_widths(spark, path, col):
    """Average per-file (max - min) width of ``col`` across parquet files."""
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    rows = (
        df.groupBy("_f")
        .agg((F.max(col) - F.min(col)).alias("w"))
        .agg(F.avg("w"))
        .first()
    )
    return float(rows[0])


class TestZorder:
    def test_interleave_matches_bit_reference(self, spark):
        rows = [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (12345, 54321)]
        df = spark.createDataFrame(rows, "a long, b long").select(
            "a", "b", interleave(F.col("a"), F.col("b")).alias("z")
        )
        for a, b, z in df.collect():
            assert z == interleave_py(a, b), (a, b)

    def test_with_zvalue_normalizes_key_ranges(self, spark):
        """Both keys must span the full 16-bit width after scaling, no
        matter how asymmetric their raw ranges are."""
        rows = [(i, 1000 + i * 7, i % 10) for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, wide long, narrow long")
        z = with_zvalue(df, ("wide", "narrow"))
        lo, hi = z.agg(F.min("_z"), F.max("_z")).first()
        assert lo == 0
        # max scaled pair is (65535, 65535) -> full 32-bit code
        assert hi == (1 << 32) - 1

    def test_clustered_write_narrows_both_columns(self, spark, tmp_path):
        li = load_table(spark, SF_ORACLE, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey"
        )
        zpath, rpath = str(tmp_path / "z"), str(tmp_path / "r")
        zorder_write(li, zpath, cols=("l_partkey", "l_suppkey"), files=16)
        li.repartition(16).write.parquet(rpath)

        for col in ("l_partkey", "l_suppkey"):
            zw, rw = file_widths(spark, zpath, col), file_widths(spark, rpath, col)
            # round-robin files span ~the full key range; z-ordered files
            # cover a tile. Require at least a 2x narrowing on BOTH keys
            # (observed ~8x on partkey, ~3x on suppkey at sf0.01 / 16 files).
            assert zw < rw / 2, f"{col}: zorder width {zw} vs round-robin {rw}"

    def test_write_preserves_rows(self, spark, tmp_path):
        li = load_table(spark, SF_SMOKE, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"
        )
        path = str(tmp_path / "z2")
        zorder_write(li, path, cols=("l_partkey", "l_suppkey"), files=4)
        back = spark.read.parquet(path)
        assert back.count() == li.count()
        assert sorted(back.columns) == sorted(li.columns)
        assert back.exceptAll(li).isEmpty() and li.exceptAll(back).isEmpty()


class TestDeltaOptimizeZorder:
    def test_compact_zorder_narrows_stats_and_preserves_data(self, spark, tmp_path):
        """OPTIMIZE ... ZORDER BY twin: after a z-ordered compaction the
        table's active files carry narrow min/max on both clustering
        columns, row content is unchanged, and the commit is a
        dataChange=false layout operation."""
        from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.delta import (
            DeltaTable,
        )

        li = load_table(spark, SF_ORACLE, "lineitem").select(
            "l_orderkey", "l_partkey", "l_suppkey"
        )
        table = DeltaTable(str(tmp_path / "t"))
        table.write(li, mode="append")
        v = table.compact(spark, target_files=16, zorder_by=("l_partkey", "l_suppkey"))
        assert v == 1

        def width(col):
            df = table.read(spark).withColumn("_f", F.input_file_name())
            return float(
                df.groupBy("_f")
                .agg((F.max(col) - F.min(col)).alias("w"))
                .agg(F.avg("w"))
                .first()[0]
            )

        full_part = 1999.0  # sf0.01 partkey range
        full_supp = 99.0
        assert width("l_partkey") < full_part / 2
        assert width("l_suppkey") < full_supp / 2
        back = table.read(spark)
        assert back.count() == li.count()
        assert back.exceptAll(li).isEmpty() and li.exceptAll(back).isEmpty()
