"""Approximate aggregates: sketches must land within their advertised error
of the exact answers (the check an oracle hash can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark.analytics import q_approx_distincts
from checkatron_spark.sources.tables import load_table

REQUIRES_TESTDATA = True  # auto-skip without driver fixtures (conftest)

SF_DIR = "/root/testdata/sf0.001"


def test_hll_within_rsd(spark):
    approx = {r.o_orderpriority: r for r in q_approx_distincts(spark, SF_DIR).collect()}
    orders = load_table(spark, "orders", SF_DIR)
    exact = {
        r.o_orderpriority: r
        for r in orders.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.expr("percentile(o_totalprice, 0.5)").alias("median"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        a, e = approx[k].approx_customers, exact[k].n_customers
        assert abs(a - e) / e < 0.1, f"{k}: HLL {a} vs exact {e}"
        am, em = approx[k].approx_median, exact[k].median
        assert abs(am - em) / em < 0.05, f"{k}: approx median {am} vs {em}"


def test_deterministic_across_runs(spark):
    a = sorted(map(tuple, q_approx_distincts(spark, SF_DIR).collect()))
    b = sorted(map(tuple, q_approx_distincts(spark, SF_DIR).collect()))
    assert a == b  # sketches are deterministic for identical input/params


def test_hll_sketch_rollup_accuracy(spark):
    """Per-day HLL sketches and their union: exact at fixture cardinality
    (sparse HLL mode), and the union row reports the true total."""
    from checkatron_spark.pipelines import q_sketch_users_daily
    from checkatron_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_sketch_users_daily(spark, sf).collect()
    per_day = [r for r in rows if r["day"] is not None]
    total = [r for r in rows if r["day"] is None]
    assert per_day and len(total) == 1
    for r in per_day:
        assert r["est_users"] == r["exact_users"], r
    exact_total = (
        load_table(spark, "events", sf).select("user_id").distinct().count()
    )
    assert total[0]["est_users"] == exact_total
