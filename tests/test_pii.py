"""PII kernel semantics on synthetic PII (the registry query
``doc_pii_redaction_audit`` pins cross-engine parity on the real corpus,
which contains no PII — these tests pin that the kernels actually find
and redact PII when it exists, in both engines)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.functions.text import (
    PII_PATTERNS,
    pii_count,
    redact_pii,
    sql_pii_count,
    sql_redact_pii,
)

ROWS = [
    (0, "contact alice.smith+x@example.co.uk or visit https://ex.com/a?b=c now"),
    (1, "server at 10.0.255.7 answered; call 555-123-4567 or 555.987.6543"),
    (2, "no pii here, just words and numbers 123 456"),
    (3, "mixed: https://h.io/u@v bob@mail.org 192.168.1.1 111-222-3333"),
    (4, ""),
]


@pytest.fixture(scope="module")
def pii_df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def counts(spark, pii_df, kind_idx):
    out = pii_df.select(
        "doc_id", pii_count(F.col("text"), PII_PATTERNS[kind_idx][1]).alias("n")
    )
    return {r["doc_id"]: r["n"] for r in out.collect()}


class TestPiiKernels:
    def test_counts_find_planted_pii(self, spark, pii_df):
        assert counts(spark, pii_df, 0) == {0: 1, 1: 0, 2: 0, 3: 1, 4: 0}  # url
        # doc 3's u@v sits inside the URL — the email pattern still sees it
        # in isolation (counts are per-pattern, pre-redaction); bob@mail.org
        # is a real second hit.
        email = counts(spark, pii_df, 1)
        assert email[0] == 1 and email[2] == 0 and email[4] == 0
        assert counts(spark, pii_df, 2) == {0: 0, 1: 1, 2: 0, 3: 1, 4: 0}  # ipv4
        assert counts(spark, pii_df, 3) == {0: 0, 1: 2, 2: 0, 3: 1, 4: 0}  # phone

    def test_redaction_removes_every_span_in_order(self, spark, pii_df):
        red = {
            r["doc_id"]: r["red"]
            for r in pii_df.select(
                "doc_id", redact_pii(F.col("text")).alias("red")
            ).collect()
        }
        assert red[0] == "contact <EMAIL> or visit <URL> now"
        assert red[1] == "server at <IPV4> answered; call <PHONE> or <PHONE>"
        assert red[2] == ROWS[2][1]  # untouched
        # URL consumed first, so its embedded u@v never becomes an <EMAIL>
        assert red[3] == "mixed: <URL> <EMAIL> <IPV4> <PHONE>"
        assert red[4] == ""
        for r in red.values():
            for _, pattern in PII_PATTERNS:
                assert not __import__("re").search(pattern, r)

    def test_duckdb_twin_matches_spark_on_planted_pii(self, spark, pii_df):
        """The registry oracle only sees zero-PII rows; this pins the
        cross-engine regex agreement where matches actually happen."""
        con = duckdb.connect()
        con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO t VALUES (?, ?)", ROWS)
        exprs = ", ".join(
            f"{sql_pii_count('text', p)} AS n{i}"
            for i, (_, p) in enumerate(PII_PATTERNS)
        )
        ddb = con.execute(
            f"SELECT doc_id, {exprs}, {sql_redact_pii('text')} AS red "
            "FROM t ORDER BY doc_id"
        ).fetchall()
        sp = (
            pii_df.select(
                "doc_id",
                *[
                    pii_count(F.col("text"), p).cast("long").alias(f"n{i}")
                    for i, (_, p) in enumerate(PII_PATTERNS)
                ],
                redact_pii(F.col("text")).alias("red"),
            )
            .orderBy("doc_id")
            .collect()
        )
        assert [tuple(r) for r in sp] == ddb
