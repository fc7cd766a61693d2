"""The SQL surface: the catalog's portable-ANSI oracle strings must run
UNCHANGED through spark.sql and produce row-identical results to the
DataFrame plans — same query text, same answers, two engines."""

import pytest

from open_bus_siri_etl_spark.plans.catalog import REGISTRY
from open_bus_siri_etl_spark.plans.sqlapi import register_views, sql

SF = "/root/testdata/sf0.001"

# oracle strings known to be in the ANSI subset both engines parse
# (no ::casts, no //, no DuckDB list functions)
PORTABLE = [
    "flagship_snowflake",
    "top_orders",
    "tpch_q6_forecast_revenue",
    "tpch_q12_shipmode_priority",
    "month_over_month_revenue",
    "event_transition_matrix",
]


def rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.select(sorted(df.columns)).collect()
    )


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_runs_on_spark(spark, name):
    q = REGISTRY[name]
    via_sql = sql(spark, SF, q.sql)
    via_df = q.fn(spark, SF)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert rows(via_sql) == rows(via_df)


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SF)
    for t in ["lineitem", "events", "documents"]:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0
