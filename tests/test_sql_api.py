"""The SQL entry point: registered temp views + spark.sql over them.

Exercises `sources.testdata.register_views` — the engine's equivalent of
the reference's catalog wiring (SURVEY.md M4): every testdata table is
addressable by name from SQL, and the SQL and DataFrame APIs produce the
same plans/results.
"""

from __future__ import annotations

from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
    register_views,
)

SF = "/root/testdata/sf0.001"


def test_register_views_makes_tables_sql_addressable(spark):
    register_views(spark, SF)
    got = spark.sql(
        """
        SELECT r.r_name AS region, count(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        """
    ).collect()
    assert sum(r.n_nations for r in got) == 25
    assert len(got) == 5


def test_sql_and_dataframe_api_agree(spark):
    register_views(spark, SF)
    via_sql = spark.sql(
        "SELECT count(*) AS n FROM events WHERE event_type = 'purchase'"
    ).collect()[0].n
    from cryptopulse_real_time_arbitrage_detection_lakehouse_spark.sources.testdata import (
        load_table,
    )

    via_df = load_table(spark, SF, "events").filter("event_type = 'purchase'").count()
    assert via_sql == via_df
