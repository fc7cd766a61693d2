"""The SQL conformance suite: EVERY catalog oracle string must run through
spark.sql — transpiled only for documented dialect constructs — and produce
row-identical results to the DataFrame plan.  Same query text (modulo the
mechanical dialect rewrites in plans/sqlapi.py), same answers, two engines:
the strongest form of the "a reference user can switch" claim.

The allowlist below is the COUNTED set of entries whose oracle SQL uses a
DuckDB structural feature with no Spark equivalent; each is asserted to
genuinely fail so the list cannot rot.
"""

import pytest

from open_bus_siri_etl_spark.plans.catalog import REGISTRY
from open_bus_siri_etl_spark.plans.sqlapi import register_views, sql, transpile

SF = "/root/testdata/sf0.001"

# Documented dialect gaps (structural, not function-level — everything
# function-level is transpiled): entry -> reason it cannot run on Spark.
NONPORTABLE = {
    # Spark 4.x recursive CTEs support UNION ALL only; UNION (distinct) is
    # load-bearing here — it dedups the frontier against ALL accumulated
    # rows, which is what terminates the min-label fixed point.  A UNION ALL
    # rewrite never reaches an empty step (the fixed point re-emits itself
    # forever), so no mechanical transpile exists.  The operator itself runs
    # on Spark as operators/dedup.connected_components (pointer-jumping).
    "neardup_components": "UNION (distinct) inside a recursive CTE",
    "neardup_survivors": "UNION (distinct) inside a recursive CTE",
    "embedding_neardup_dedup": "UNION (distinct) inside a recursive CTE",
    # share the batch entries' SQL verbatim (fold-in == recompute)
    "neardup_components_delta": "UNION (distinct) inside a recursive CTE",
    "neardup_survivors_delta": "UNION (distinct) inside a recursive CTE",
    "neardup_components_dispatch": "UNION (distinct) inside a recursive CTE",
}

ORACLES = sorted(n for n, q in REGISTRY.items() if q.sql is not None)
PORTABLE = [n for n in ORACLES if n not in NONPORTABLE]


def rows(df):
    return sorted(
        tuple(str(v) for v in r) for r in df.select(sorted(df.columns)).collect()
    )


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF)
    return spark


@pytest.mark.parametrize("name", PORTABLE)
def test_oracle_sql_conforms_on_spark(views, name):
    q = REGISTRY[name]
    via_sql = views.sql(transpile(q.sql))
    via_df = q.fn(views, SF)
    assert sorted(via_sql.columns) == sorted(via_df.columns)
    assert rows(via_sql) == rows(via_df)


@pytest.mark.parametrize("name", sorted(NONPORTABLE))
def test_allowlisted_entries_genuinely_fail(views, name):
    """If a dialect gap closes (Spark gains the feature or the transpiler
    learns it), this fails and the entry must move to the conformance set."""
    with pytest.raises(Exception):
        views.sql(transpile(REGISTRY[name].sql)).collect()


def test_allowlist_is_small():
    # 6 = the three recursive-CTE batch entries + the three entries that
    # share their SQL verbatim (delta fold, survivors fold, dispatch twin)
    assert len(NONPORTABLE) <= 6, "dialect allowlist must stay enumerable"


def test_register_views_exposes_all_tables(spark):
    register_views(spark, SF)
    for t in ["lineitem", "events", "documents"]:
        assert spark.sql(f"SELECT count(*) AS n FROM {t}").collect()[0].n > 0


def test_sql_helper_runs(spark):
    out = sql(spark, SF, "SELECT count(*) AS n FROM documents")
    assert out.collect()[0].n > 0
