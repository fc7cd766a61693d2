"""Unit tests for the DuckDB->Spark dialect transpiler (plans/sqlapi.py):
string-level guards for each rewrite rule, so a rule regression is caught
without running either engine.  The end-to-end row-identity proof lives in
test_sqlapi.py; these pin the mechanics."""

import pytest

from open_bus_siri_etl_spark.plans.sqlapi import transpile


def test_literals_are_never_rewritten():
    sql = "SELECT regexp_extract_all(text, '[a-z]+ // (not) [code]')"
    out = transpile(sql)
    assert "'[a-z]+ // (not) [code]'" in out  # literal body untouched
    assert out.startswith("SELECT regexp_extract_all(text,")
    assert out.rstrip().endswith(", 0)")  # DuckDB default group 0 appended


def test_backslashes_doubled_in_literals():
    assert r"'\\+1-555'" in transpile(r"SELECT regexp_matches(x, '\+1-555')")


def test_floor_div_and_types():
    out = transpile("SELECT a // 2, CAST(x AS UBIGINT), y::VARCHAR FROM t")
    assert " div " in out and "//" not in out
    assert "UBIGINT" not in out and "BIGINT" in out
    assert "::STRING" in out and "VARCHAR" not in out


def test_unnest_subscripts_to_posexplode():
    out = transpile(
        "WITH f AS (SELECT vec_id, unnest(embedding)::DOUBLE AS v,\n"
        "generate_subscripts(embedding, 1) AS i FROM embeddings) SELECT 1"
    )
    assert "LATERAL VIEW posexplode(embedding)" in out
    assert "generate_subscripts" not in out and "unnest" not in out
    assert "(_up0 + 1) AS i" in out


def test_lambda_index_shift_is_one_based():
    out = transpile("SELECT list_transform(l, (x, i) -> x || l[i + 1]) FROM t")
    assert "(i + 1) + 1" in out.replace("element_at(l, ", "")
    # accumulator lambdas (second var not 'i') are untouched
    out2 = transpile("SELECT aggregate(l, 0, (acc, b) -> acc + b) FROM t")
    assert "(b + 1)" not in out2


def test_hex_casts_both_syntaxes():
    o1 = transpile("SELECT ('0x' || substr(md5(x), 1, 8))::BIGINT FROM t")
    assert "conv(substr(md5(x), 1, 8), 16, 10)" in o1
    o2 = transpile("SELECT CAST(('0x' || substr(md5(x), 1, 8)) AS UBIGINT) FROM t")
    assert "conv(" in o2 and "0x" not in o2


def test_generate_series_guard_and_tvf():
    # 3-arg integer series guards the empty range (sequence would raise)
    out = transpile("SELECT list_transform(generate_series(1, n, 2), x -> x)")
    assert "CASE WHEN (n) >= (1)" in out
    # timestamp+interval series stays unguarded (always ascending here)
    out2 = transpile(
        "SELECT 1 FROM generate_series(TIMESTAMP '2024-01-01', "
        "TIMESTAMP '2024-01-02', INTERVAL 1 MINUTE) t(gs)"
    )
    assert "FROM explode(sequence(" in out2
    assert "CASE WHEN" not in out2


def test_decimal_literals_become_double():
    out = transpile("SELECT x * 1.0 / y, round(z, 6), 0.5 FROM t")
    assert "1.0D" in out and "0.5D" in out
    assert "round(z, 6)" in out  # integer args untouched


def test_strftime_format_mapping():
    out = transpile("SELECT strftime(ts, '%Y/%m/%d/%H/%M') FROM t")
    assert "date_format(ts, 'yyyy/MM/dd/HH/mm')" in out


def test_filter_and_ignore_nulls_placement():
    out = transpile(
        "SELECT count(*) FILTER (x IS NULL), last_value(v IGNORE NULLS) OVER ()"
    )
    assert "FILTER (WHERE x IS NULL)" in out
    assert "last_value(v) IGNORE NULLS" in out


def test_ignore_nulls_on_arbitrary_expressions():
    out = transpile(
        "SELECT last_value(CASE WHEN v IS NOT NULL THEN epoch(ts) END"
        " IGNORE NULLS) OVER w FROM t WINDOW w AS (ORDER BY ts)"
    )
    assert "END) IGNORE NULLS OVER w" in out
    assert "IGNORE NULLS)" not in out


def test_range_empty_guard_keeps_int_element_type():
    out = transpile("SELECT list_transform(range(1, n), i -> xs[i])")
    assert "CASE WHEN (n) - 1 >= (1)" in out
    assert "ARRAY<INT>" in out  # BIGINT here would break element_at's index


def test_mask_unmask_roundtrip_property():
    """Literal masking must be lossless for any SQL-ish text, including
    adjacent quotes and '' escapes — every symbol rule depends on it."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from open_bus_siri_etl_spark.plans.sqlapi import _mask_literals, _unmask

    sqlish = st.text(
        alphabet=st.sampled_from(list("abc'() ,.*/\\%[]|=<>-_0123456789\n")),
        max_size=80,
    )

    @settings(max_examples=300, deadline=None)
    @given(sqlish)
    def check(s):
        masked, lits = _mask_literals(s)
        assert _unmask(masked, lits) == s
        # no quote may survive outside a placeholder unless unbalanced
        if s.count("'") % 2 == 0:
            assert "'" not in masked

    check()


def test_asof_rewrite_refuses_trailing_conjunct():
    """ASOF ... ON eq AND ineq AND extra must NOT be interval-ized: a
    right row failing the extra predicate still closes its predecessor's
    interval in the rewrite, but DuckDB filters BEFORE match selection —
    the shapes diverge, so the rewrite refuses (unrewritten ASOF fails
    Spark's parser and lands in the counted allowlist, never silently
    returns different rows)."""
    q = (
        "SELECT * FROM l ASOF JOIN r a ON l.k = a.k AND l.ts >= a.ts "
        "AND l.flag = a.flag"
    )
    assert "ASOF" in transpile(q)  # left for the allowlist
    # leading extra conjunct: the eq-then-ineq adjacency never matches
    q2 = (
        "SELECT * FROM l ASOF JOIN r a ON l.flag = a.flag AND l.k = a.k "
        "AND l.ts >= a.ts"
    )
    # the rewrite only fires on the exact two-predicate shape
    assert ("ASOF" in transpile(q2)) or ("__asof_next" not in transpile(q2))


@pytest.mark.slow
def test_asof_rewrite_property_vs_duckdb(spark):
    """Hypothesis-generated ASOF shapes (round-7 directive): table vs
    subquery vs nested-paren-depth-2 subquery right sides, inner and LEFT,
    random key/ts data — transpile-then-run on Spark must return exactly
    DuckDB's rows.  Right-side (k, ts) pairs are generated unique because
    DuckDB's tied-row pick is engine-unspecified (the catalog's ASOF
    oracles pin ties via an event_id window order instead)."""
    import duckdb
    import pandas as pd
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    lrows = st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 40), st.integers(-5, 5)
        ),
        max_size=12,
    )
    rrows = st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(0, 40), st.integers(-5, 5)
        ),
        max_size=12,
        unique_by=lambda r: (r[0], r[1]),
    )

    RIGHT_SHAPES = {
        "table": "asof_r",
        "subq": "(SELECT k, ts, rv FROM asof_r WHERE rv >= -5)",
        "subq2": "(SELECT k, ts, rv FROM (SELECT * FROM asof_r WHERE rv >= -5))",
    }

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lr=lrows,
        rr=rrows,
        shape=st.sampled_from(sorted(RIGHT_SHAPES)),
        left_join=st.booleans(),
    )
    def check(lr, rr, shape, left_join):
        lpdf = pd.DataFrame(lr, columns=["k", "ts", "lv"]).astype("int64")
        rpdf = pd.DataFrame(rr, columns=["k", "ts", "rv"]).astype("int64")
        q = (
            "SELECT l.k AS k, l.ts AS lts, l.lv AS lv, "
            "a.ts AS rts, a.rv AS rv "
            f"FROM asof_l l ASOF {'LEFT ' if left_join else ''}JOIN "
            f"{RIGHT_SHAPES[shape]} a ON l.k = a.k AND l.ts >= a.ts"
        )
        con = duckdb.connect()
        con.register("asof_l", lpdf)
        con.register("asof_r", rpdf)
        want = sorted(map(tuple, con.execute(q).fetchall()))
        con.close()

        spark.createDataFrame(
            lpdf, "k long, ts long, lv long"
        ).createOrReplaceTempView("asof_l")
        spark.createDataFrame(
            rpdf, "k long, ts long, rv long"
        ).createOrReplaceTempView("asof_r")
        got = sorted(
            tuple(r) for r in spark.sql(transpile(q)).collect()
        )
        assert got == want

    check()


def test_unnest_scoping_skips_scalar_subqueries():
    """Round-9 (ADVICE): the enclosing-SELECT search is paren-depth-aware.
    A scalar subquery sitting between the block's SELECT and the
    generate_subscripts call used to swallow the rfind — earlier unnest(x)
    occurrences in the OUTER select list were left unrewritten."""
    out = transpile(
        "SELECT unnest(embedding)::DOUBLE AS v,\n"
        "(SELECT max(vec_id) FROM embeddings) AS m,\n"
        "generate_subscripts(embedding, 1) AS i FROM embeddings"
    )
    assert "unnest" not in out
    assert "generate_subscripts" not in out
    assert "_uv0" in out and "(_up0 + 1) AS i" in out
    # the lateral view must attach to the OUTER FROM, after 'embeddings'
    assert "FROM embeddings LATERAL VIEW posexplode(embedding)" in out

    # ... and the FROM search skips a subquery's FROM too: a scalar
    # subquery AFTER the generator must not capture the lateral view
    out2 = transpile(
        "SELECT generate_subscripts(embedding, 1) AS i,\n"
        "(SELECT max(vec_id) FROM embeddings) AS m,\n"
        "unnest(embedding)::DOUBLE AS v FROM embeddings"
    )
    assert "unnest" not in out2 and "generate_subscripts" not in out2
    assert "FROM embeddings LATERAL VIEW posexplode(embedding)" in out2


def test_unnest_scoping_handles_paren_wrapped_generator():
    """A generator call wrapped in parens (CAST, arithmetic) sits DEEPER
    than its enclosing SELECT — the depth-aware scoping must climb to the
    nearest still-open SELECT, and the FROM scan must net the wrapper
    parens back to the select's own depth."""
    out = transpile(
        "SELECT unnest(embedding)::DOUBLE AS v,\n"
        "CAST(generate_subscripts(embedding, 1) AS BIGINT) AS i\n"
        "FROM embeddings"
    )
    assert "unnest" not in out and "generate_subscripts" not in out
    assert "CAST((_up0 + 1) AS BIGINT) AS i" in out
    assert "FROM embeddings LATERAL VIEW posexplode(embedding)" in out
