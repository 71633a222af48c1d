"""Pooled combined-audit members run on isolated session clones (r13).

The r12 verdict's one scale-safety defect: `scoped_shuffle_partitions`
mutates the session-wide `spark.sql.shuffle.partitions`, so while one
pooled member drained a stream at width 4, every sibling member planned
in that window compiled its batch shuffles 4 wide. Members now run on
per-member `cloneSession()` clones (shared SparkContext, isolated
SQLConf), and the scope itself keeps a per-session LIFO stack so nested
scopes with different widths restore exactly what they displaced.
"""

from __future__ import annotations

import threading

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark import plans
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.plans.combined import (
    _member_session,
)
from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.streaming.sinks import (
    scoped_shuffle_partitions,
)

from conftest import SF_SMOKE

KEY = "spark.sql.shuffle.partitions"


def test_concurrent_scoped_drain_does_not_narrow_siblings(spark):
    """While a 'streaming member' holds width 4 on ITS clone, a
    concurrently planned 'batch member' on another clone (and the parent
    session) keeps the cluster width — the r12 contamination scenario."""
    parent_width = spark.conf.get(KEY)
    a = _member_session(spark)
    b = _member_session(spark)
    assert a is not spark and b is not spark
    entered = threading.Event()
    release = threading.Event()

    def drainer() -> None:
        with scoped_shuffle_partitions(a, 4):
            entered.set()
            release.wait(10)

    t = threading.Thread(target=drainer)
    t.start()
    assert entered.wait(10)
    try:
        assert a.conf.get(KEY) == "4"
        assert b.conf.get(KEY) == parent_width
        assert spark.conf.get(KEY) == parent_width
    finally:
        release.set()
        t.join(10)
    assert a.conf.get(KEY) == parent_width


def test_clone_carries_runtime_conf(spark):
    """cloneSession (not newSession): runtime-set conf — e.g. a foreign
    driver session's timezone — must carry into member sessions."""
    marker = "spark.cryptopulse.test.marker"
    spark.conf.set(marker, "42")
    try:
        c = _member_session(spark)
        assert c.conf.get(marker) == "42"
    finally:
        spark.conf.unset(marker)


def test_scope_stack_restores_mixed_width_nesting(spark):
    """Nested scopes with different widths restore LIFO: the r12
    ref-count restored only the outermost prior (r12 ADVICE)."""
    s = _member_session(spark)
    prior = s.conf.get(KEY)
    with scoped_shuffle_partitions(s, 16):
        assert s.conf.get(KEY) == "16"
        with scoped_shuffle_partitions(s, 4):
            assert s.conf.get(KEY) == "4"
        assert s.conf.get(KEY) == "16"
    assert s.conf.get(KEY) == prior


def test_clone_runs_member_query_end_to_end(spark):
    sess = _member_session(spark)
    df = plans.get("nations_per_region").fn(sess, SF_SMOKE)
    assert df.count() > 0
