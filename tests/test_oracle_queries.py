"""Every registered query hash-matches its DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json):
row count + column names + order-insensitive exact values.
"""

from __future__ import annotations

import pytest

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

from conftest import SF_ORACLE, assert_oracle_match

def _module(name: str) -> str:
    return plans.get(name).fn.__module__.rsplit(".", 1)[-1]


# ordered and id'd by (plans module, name): failures cluster per module,
# `-x` stops inside the broken module, and `-k "medallion"` (etc.)
# re-runs exactly one module's queries during a targeted loop
ORACLE_SPECS = sorted(plans.all_oracles(), key=lambda n: (_module(n), n))


@pytest.mark.parametrize(
    "name", ORACLE_SPECS, ids=lambda n: f"{_module(n)}--{n}"
)
def test_query_matches_oracle(spark, ddb, name):
    spec = plans.get(name)
    df = spec.fn(spark, SF_ORACLE)
    assert_oracle_match(df, ddb, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0, "driver contract: entry() must produce rows"
    assert "symbol" in df.columns and "vwap" in df.columns


def test_registry_consistency():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert qs, "registry must not be empty"
