"""`operators.expectations.apply_expectations` — DLT-style expectation
semantics: warn keeps, drop quarantines with per-rule annotation, fail
aborts, NULL predicates count as violations."""

from __future__ import annotations

import pytest

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.operators.expectations import (  # noqa: E501
    Expectation,
    ExpectationViolation,
    apply_expectations,
)


def _df(spark):
    return spark.createDataFrame(
        [(1, 10.0, "a"), (2, -5.0, "a"), (3, 99.0, "b"), (4, None, "c")],
        "id long, v double, cat string",
    )


def test_drop_and_warn_semantics(spark):
    clean, quarantine, stats = apply_expectations(
        _df(spark),
        [
            Expectation("v_nonneg", "v >= 0", "drop"),
            Expectation("cat_ab", "cat IN ('a','b')", "drop"),
            Expectation("v_small", "v < 50", "warn"),
        ],
    )
    assert {r.id for r in clean.collect()} == {1, 3}
    q = {r["id"]: sorted(r["__violations"]) for r in quarantine.collect()}
    # id=2: negative; id=4: NULL v (violation, not a pass) AND cat 'c'
    assert q == {2: ["v_nonneg"], 4: ["cat_ab", "v_nonneg"]}
    by_name = {s["rule"]: s for s in stats}
    assert by_name["v_nonneg"] == {
        "rule": "v_nonneg", "action": "drop", "n_pass": 2, "n_fail": 2,
    }
    # warn counts violations but removed nothing: id=3 (99.0) fails it
    # yet sits in clean
    assert by_name["v_small"]["n_fail"] == 2  # 99.0 and NULL
    assert 3 in {r.id for r in clean.collect()}


def test_fail_action_aborts(spark):
    with pytest.raises(ExpectationViolation, match="v_nonneg.*2 row"):
        apply_expectations(
            _df(spark), [Expectation("v_nonneg", "v >= 0", "fail")]
        )


def test_fail_action_clean_when_no_violation(spark):
    clean, quarantine, stats = apply_expectations(
        _df(spark), [Expectation("id_pos", "id > 0", "fail")]
    )
    assert clean.count() == 4 and quarantine.count() == 0
    assert stats[0]["n_fail"] == 0
    # fail-only gating: quarantine's annotation column still typed
    assert dict(quarantine.dtypes)["__violations"] == "array<string>"


def test_guards(spark):
    with pytest.raises(ValueError, match="at least one rule"):
        apply_expectations(_df(spark), [])
    with pytest.raises(ValueError, match="duplicate"):
        apply_expectations(
            _df(spark),
            [Expectation("x", "v >= 0", "drop"), Expectation("x", "v < 0")],
        )
    with pytest.raises(ValueError, match="unknown action"):
        Expectation("x", "v >= 0", "discard")
