"""CLI dispatch (the reference's shell-driven operation, SURVEY.md 3.1-3.2):
list/query/pipeline must work against an injected session."""

from __future__ import annotations

import pytest

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.cli import main

from test_streaming import make_raw_ticks


class TestCli:
    def test_list_prints_registry(self, capsys):
        assert main(["list"]) == 0
        out = capsys.readouterr().out
        assert "gold_candles_1m" in out and "(oracle)" in out

    def test_list_tag_filter(self, capsys):
        assert main(["list", "--tag", "kmeans"]) == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out and all("kmeans" in line for line in out)

    def test_query_shows_rows(self, spark, capsys):
        assert main(["query", "distinct_symbols"], spark=spark) == 0
        assert "S0" in capsys.readouterr().out

    def test_query_unknown_name_raises(self, spark):
        with pytest.raises(KeyError):
            main(["query", "no_such_query"], spark=spark)

    def test_pipeline_sequential(self, spark, tmp_path, capsys):
        raw = str(tmp_path / "raw")
        make_raw_ticks(spark, n=120).write.parquet(raw)
        rc = main(
            ["pipeline", "--raw-dir", raw, "--out-root", str(tmp_path / "out")],
            spark=spark,
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "bronze: 120 rows" in out and "silver: 120 rows" in out
        assert "gold:" in out


def test_query_catalog_is_current():
    """QUERIES.md must match the live registry (regenerate with
    tools/gen_query_catalog.py when adding queries)."""
    import subprocess
    import sys
    from pathlib import Path

    repo = Path(__file__).resolve().parents[1]
    rc = subprocess.run(
        [sys.executable, str(repo / "tools" / "gen_query_catalog.py"), "--check"],
        capture_output=True,
        text=True,
    )
    assert rc.returncode == 0, rc.stdout + rc.stderr
