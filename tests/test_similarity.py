"""Similarity-search extension tests beyond the oracle gate: the fast
NumPy path must agree with the exact-decimal path on ranking."""

from __future__ import annotations

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans

from conftest import SF_ORACLE


def test_fast_path_matches_exact_ranking(spark):
    exact = plans.get("sim_cosine_topk").fn(spark, SF_ORACLE).collect()
    fast = plans.get("sim_cosine_topk_fast").fn(spark, SF_ORACLE).collect()
    assert [r.vec_id for r in exact] == [r.vec_id for r in fast]
    # both paths share the quantized-integer discipline: cosines are
    # BIT-identical, not merely close.
    for e, f in zip(exact, fast):
        assert e.cosine == f.cosine


def test_lsh_topk_subset_of_bucket(spark):
    rows = plans.get("sim_cosine_topk_lsh").fn(spark, SF_ORACLE).collect()
    assert rows, "query bucket should contain neighbors"
    assert len({r.bucket for r in rows}) == 1
