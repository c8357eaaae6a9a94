"""Unit tests for the declarative expectation suite
(checkatron_spark/expectations.py): every kind fires on a known
violation, clean columns pass, and the whole suite compiles to ONE scan
of the input (the at-scale claim)."""

from __future__ import annotations

import os

import pytest

from checkatron_spark.expectations import expectations_report


def _report(spark, rows, schema, suite):
    df = spark.createDataFrame(rows, schema)
    return {
        (r.expectation, r.column): r
        for r in expectations_report(df, suite).collect()
    }


def test_each_kind_fires_and_counts(spark):
    rows = [
        (1, "A", 10.0, "1-HIGH"),
        (2, None, 250.0, "9-BOGUS"),   # null id2; range high; bad prefix
        (2, "B", -5.0, "2-LOW"),       # dup key; range low
        (4, "Z", 50.0, None),          # value not in set; null regex col
    ]
    suite = [
        ("not_null", "name"),
        ("unique", "id"),
        ("range", "price", 0, 100),
        ("in_set", "name", ["A", "B"]),
        ("matches", "prio", "^[1-5]-"),
    ]
    got = _report(
        spark, rows, "id int, name string, price double, prio string", suite
    )
    r = got[("not_null", "name")]
    assert (r.n_checked, r.n_violations, r.passed) == (4, 1, False)
    r = got[("unique", "id")]
    assert (r.n_checked, r.n_violations, r.passed) == (4, 1, False)
    r = got[("range", "price")]
    assert (r.n_checked, r.n_violations, r.passed) == (4, 2, False)
    r = got[("in_set", "name")]  # NULL name is not checked, Z violates
    assert (r.n_checked, r.n_violations, r.passed) == (3, 1, False)
    r = got[("matches", "prio")]  # NULL prio not checked, 9-BOGUS violates
    assert (r.n_checked, r.n_violations, r.passed) == (3, 1, False)


def test_clean_suite_passes(spark):
    rows = [(1, "A"), (2, "B")]
    suite = [("not_null", "name"), ("unique", "id")]
    got = _report(spark, rows, "id int, name string", suite)
    assert all(r.passed and r.n_violations == 0 for r in got.values())


# per-test skip (NOT the module-level REQUIRES_TESTDATA flag): only this
# test reads fixtures — the pure-unit tests above must keep running on
# machines without /root/testdata
@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.001"),
    reason="driver fixtures not present",
)
def test_suite_is_single_scan(spark):
    from checkatron_spark.sources.tables import load_table

    orders = load_table(spark, "orders", "/root/testdata/sf0.001")
    suite = [
        ("not_null", "o_custkey"),
        ("unique", "o_orderkey"),
        ("range", "o_totalprice", 0, 1000000),
        ("in_set", "o_orderstatus", ["O", "F", "P"]),
    ]
    plan = (
        expectations_report(orders, suite)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("FileScan") == 1, plan


def test_embedding_audit_catches_degenerates(spark):
    import math

    from checkatron_spark.pipelines import embedding_audit

    rows = [
        (0, [1.0, 0.0]),            # healthy
        (1, None),                  # null vector
        (2, [1.0, 2.0, 3.0]),       # wrong dim
        (3, [0.0, 0.0]),            # zero vector
        (4, [float("nan"), 1.0]),   # NaN component
        (5, [math.inf, 1.0]),       # Inf component
        (6, [None, 1.0]),           # NULL component (three-valued trap)
        (7, [1.0e10, 0.0]),         # finite but exploded magnitude —
                                    # counted, never squared (overflow)
    ]
    r = embedding_audit(
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        dim=2,
    ).collect()[0]
    assert r.n_vecs == 8
    assert r.n_null_vec == 1
    assert r.n_null_component == 1
    assert r.n_wrong_dim == 1
    assert r.n_nonfinite == 2
    assert r.n_out_of_range == 1
    assert r.n_zero_vec == 1
    # healthy + zero vec are the only 'ok' rows: norms 1000^2 and 0 on
    # the 1e3 grid
    assert (r.min_qnorm, r.max_qnorm, r.sum_qnorm) == (
        0, 10**6, 10**6
    )
