"""DIFF(...) SQL table-macro (plans/sqlmacro.py — the SURVEY §4.2
optional-stretch surface). The declared diff_orders_sqlmacro query grades
the macro against the rendered-SQL oracle; these tests pin the parser
(quote-awareness, options, error shapes) and the composition semantics
(the expanded view optimizes WITH the outer query)."""

from __future__ import annotations

import pytest

from checkatron_spark.plans.sqlmacro import (
    _find_calls,
    _parse_call,
    expand_diff_macros,
    sql,
)


def _views(spark):
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["k", "v", "amt"],
    ).createOrReplaceTempView("m_before")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (4, "d", 40.0)],
        ["k", "v", "amt"],
    ).createOrReplaceTempView("m_after")


def test_macro_matches_operator_output(spark):
    from checkatron_spark.operators.diff import diff

    _views(spark)

    def norm(df):
        return sorted(
            (tuple(r) for r in df.collect()),
            key=lambda t: tuple((x is None, str(x)) for x in t),
        )

    got = norm(
        sql(spark, "SELECT * FROM DIFF(m_before, m_after, KEYS(k))")
    )
    want = norm(
        diff(spark.table("m_before"), spark.table("m_after"), ["k"])
    )
    assert got == want and len(got) == 4


def test_macro_composes_with_outer_sql(spark):
    _views(spark)
    rows = sql(
        spark,
        "SELECT _row_status, COUNT(*) AS n "
        "FROM DIFF(m_before, m_after, KEYS(k)) "
        "WHERE _row_status IS NOT NULL GROUP BY _row_status ORDER BY 1",
    ).collect()
    # key 4 only-after -> MISSING_IN_BEFORE (4); key 3 only-before -> 5
    assert [(r["_row_status"], r["n"]) for r in rows] == [(4, 1), (5, 1)]


def test_macro_options_and_two_calls(spark):
    _views(spark)
    out = sql(
        spark,
        "SELECT a._row_status AS sa, b._row_status AS sb "
        "FROM DIFF(m_before, m_after, KEYS(k), BEFORE_WHERE => 'k <> 3') a "
        "JOIN DIFF(m_before, m_after, KEYS(k), FAITHFUL) b "
        "ON a.K_K = b.K_K WHERE a.K_K = 4",
    ).collect()
    # key 4 exists only in the after side -> MISSING_IN_BEFORE (4) under
    # both the default single-join and the FAITHFUL 3-CTE expansion
    assert [(r["sa"], r["sb"]) for r in out] == [(4, 4)]


def test_macro_ignores_diff_inside_string_literals(spark):
    _views(spark)
    rows = sql(
        spark,
        "SELECT 'use DIFF(a, b, KEYS(k)) here' AS hint, COUNT(*) AS n "
        "FROM DIFF(m_before, m_after, KEYS(k)) GROUP BY 1",
    ).collect()
    assert rows[0]["n"] == 4 and "DIFF(a, b" in rows[0]["hint"]


def test_macro_passthrough_without_diff(spark):
    assert sql(spark, "SELECT 1 AS one").collect()[0]["one"] == 1
    # and the expansion is the identity on such queries
    assert expand_diff_macros(spark, "SELECT 1") == "SELECT 1"


def test_macro_parser_errors(spark):
    _views(spark)
    with pytest.raises(ValueError, match="KEYS"):
        sql(spark, "SELECT * FROM DIFF(m_before, m_after)")
    with pytest.raises(ValueError, match="identifier"):
        sql(spark, "SELECT * FROM DIFF('lit', m_after, KEYS(k))")
    with pytest.raises(ValueError, match="unknown DIFF"):
        sql(spark, "SELECT * FROM DIFF(m_before, m_after, KEYS(k), BOGUS)")
    with pytest.raises(ValueError, match="unbalanced"):
        sql(spark, "SELECT * FROM DIFF(m_before, m_after, KEYS(k)")


def test_macro_skips_qualified_diff_references(spark):
    """ADVICE r11: catalog.DIFF(...) is a qualified reference to the
    user's own function/table — the macro must leave it to Spark's
    resolver (pass-through), not rewrite it into invalid
    catalog.__diff_macro_N SQL."""
    q = "SELECT * FROM cat.DIFF(a, b, KEYS(k))"
    assert expand_diff_macros(spark, q) == q
    # whitespace between the dot and DIFF is still qualified
    q2 = "SELECT * FROM cat.  DIFF(a, b, KEYS(k))"
    assert expand_diff_macros(spark, q2) == q2
    # but an unqualified call right after a dotted EXPRESSION elsewhere
    # in the text still expands
    _views(spark)
    rows = sql(
        spark,
        "SELECT t.k, COUNT(*) AS n "
        "FROM DIFF(m_before, m_after, KEYS(k)) t GROUP BY t.k",
    ).collect()
    assert sum(r["n"] for r in rows) == 4


def test_macro_views_unique_and_dropped(spark):
    """ADVICE r11: sql() drops its macro views after analysis (no catalog
    leak, no collision with a user view named __diff_macro_0), and
    repeated calls never reuse a live view name."""
    _views(spark)
    before = {t.name for t in spark.catalog.listTables()}
    df1 = sql(spark, "SELECT COUNT(*) AS n FROM DIFF(m_before, m_after, KEYS(k))")
    df2 = sql(spark, "SELECT COUNT(*) AS n FROM DIFF(m_before, m_after, KEYS(k))")
    after = {t.name for t in spark.catalog.listTables()}
    assert after == before  # nothing leaked
    # both results still evaluate after their views were dropped
    assert df1.collect()[0]["n"] == df2.collect()[0]["n"] == 4
    # expand_diff_macros (inspection form) keeps its views but the names
    # are unique per expansion — two calls never clobber each other
    r1 = expand_diff_macros(
        spark, "SELECT * FROM DIFF(m_before, m_after, KEYS(k))"
    )
    r2 = expand_diff_macros(
        spark, "SELECT * FROM DIFF(m_before, m_after, KEYS(k))"
    )
    v1 = r1.split("FROM ")[1].strip()
    v2 = r2.split("FROM ")[1].strip()
    assert v1 != v2
    for v in (v1, v2):
        spark.catalog.dropTempView(v)


def test_macro_scanner_skips_comments_and_double_quotes(spark):
    """Review r11: the scanner must lex SQL comments and double-/backtick-
    quoted sections, not just single-quoted strings — an apostrophe in a
    comment crashed the first cut, and a DIFF inside a comment or quoted
    literal was expanded."""
    # apostrophe inside a line comment: valid SQL, must not crash
    assert sql(spark, "SELECT 1 AS one -- don't do it").collect()[0][
        "one"
    ] == 1
    # DIFF inside a line comment / block comment / double-quoted literal
    # must NOT expand (expansion would fail on spark.table('a'))
    q1 = "SELECT 1 AS one -- DIFF(a, b, KEYS(k))"
    assert expand_diff_macros(spark, q1) == q1
    q2 = "SELECT 1 AS one /* DIFF(a, b, KEYS(k)) */"
    assert expand_diff_macros(spark, q2) == q2
    q3 = 'SELECT "DIFF(a, b, KEYS(k))" FROM t'
    assert expand_diff_macros(spark, q3) == q3
    # and a real call AFTER a comment still expands
    _views(spark)
    rows = sql(
        spark,
        "-- compare the two snapshots, don't trust either\n"
        "SELECT COUNT(*) AS n FROM DIFF(m_before, m_after, KEYS(k))",
    ).collect()
    assert rows[0]["n"] == 4


def test_macro_scanner_property_inert_regions():
    """Property: wherever a DIFF(...) call is embedded inside an inert
    region (string / double-quoted / backtick / line comment / block
    comment), _find_calls must not see it; outside one, it must. Built
    from composed random fragments so region boundaries land in varied
    adjacency (comment before string, string before call, etc.)."""
    import random

    rng = random.Random(1106)
    call = "DIFF(tab_a, tab_b, KEYS(k))"
    inert_wrappers = [
        lambda c: f"'{c}'",
        lambda c: f'"{c}"',
        lambda c: f"`{c}`",
        lambda c: f"-- {c}\n",
        lambda c: f"/* {c} */",
    ]
    filler = ["SELECT x", "FROM t", "WHERE a = 'it''s'", "-- note\n",
              "/* multi\nline */", "'str -- not comment'", '"dq (x"']
    for trial in range(60):
        parts, expect = [], 0
        for _ in range(rng.randint(2, 8)):
            roll = rng.random()
            if roll < 0.25:
                parts.append(rng.choice(inert_wrappers)(call))
            elif roll < 0.45:
                parts.append(call)
                expect += 1
            else:
                parts.append(rng.choice(filler))
        text = " ".join(parts)
        spans = _find_calls(text)
        assert len(spans) == expect, (trial, text)
        # every reported span really is the call's argument list
        assert all(s[2].strip() == "tab_a, tab_b, KEYS(k)" for s in spans)


def test_macro_scanner_spans():
    spans = _find_calls(
        "SELECT * FROM DIFF(a, b, KEYS(k)) x, 'DIFF(nope)' y"
    )
    assert len(spans) == 1 and spans[0][2] == "a, b, KEYS(k)"
    o = _parse_call("s.t1, s.t2, KEYS(k1, k2), AFTER_WHERE => 'v = ''x'''")
    assert o["keys"] == ["k1", "k2"] and o["after_where"] == "v = 'x'"


def test_macro_failed_expansion_leaks_no_views(spark):
    """ADVICE r12: when a LATER span's expansion raises (missing table,
    bad options), the views already registered for earlier spans are
    dropped — sql()'s finally only covers the spark.sql call, so the
    expansion loop must clean up after itself."""
    import pytest

    from checkatron_spark.plans import sqlmacro

    spark.createDataFrame([(1, "a")], ["k", "v"]).createOrReplaceTempView(
        "mleak_t"
    )
    try:
        before = {
            t.name for t in spark.catalog.listTables()
            if t.name.startswith("__diff_macro_")
        }
        with pytest.raises(Exception):
            sqlmacro.sql(
                spark,
                "SELECT * FROM DIFF(mleak_t, mleak_t, KEYS(k)) a "
                "JOIN DIFF(mleak_t, no_such_table_xyz, KEYS(k)) b",
            )
        after = {
            t.name for t in spark.catalog.listTables()
            if t.name.startswith("__diff_macro_")
        }
        assert after == before
    finally:
        spark.catalog.dropTempView("mleak_t")
