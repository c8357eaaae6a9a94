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


def test_binned_quantiles_from_partials_hand_case(spark):
    """quantile_disc rule on bin ids: smallest bin whose running count
    reaches ceil(q*N) — pinned on a 10-row hand-checkable fixture routed
    through the declared query's exact dataflow (daily partials merged by
    addition, then the array fold)."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    # emulate the declared pipeline on a tiny frame via the same operators:
    # bins 0,0,0,1,1,2,2,2,2,9 -> N=10; q=.5 target 5 -> bin 1 (cum 5);
    # q=.9 target 9 -> bin 2 (cum 9); q=.99 target 10 -> bin 9 (cum 10)
    rows = [(d, b) for d, b in
            [(1, 0), (1, 0), (2, 0), (1, 1), (2, 1),
             (1, 2), (2, 2), (3, 2), (3, 2), (3, 9)]]
    df = spark.createDataFrame(rows, "_day int, bin bigint")
    partials = df.groupBy("_day", "bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    merged = partials.groupBy("bin").agg(F.sum("n").alias("n"))
    hist = merged.agg(
        F.sort_array(F.collect_list(F.struct("bin", "n"))).alias("_h"),
        F.sum("n").cast("bigint").alias("n_total"),
    )
    qs = hist.select(
        F.explode(F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99))).alias("q"),
        "_h", "n_total",
    )
    target = F.ceil(F.col("q") * F.col("n_total")).cast("bigint")
    init = F.struct(F.lit(0).cast("bigint").alias("cum"),
                    F.lit(-1).cast("bigint").alias("bin"))

    def _walk(acc, x):
        cum = acc["cum"] + x["n"]
        return F.when(acc["bin"] >= 0, acc).otherwise(
            F.when(cum >= target,
                   F.struct(cum.alias("cum"), x["bin"].alias("bin")))
            .otherwise(F.struct(cum.alias("cum"),
                                F.lit(-1).cast("bigint").alias("bin"))))

    found = F.aggregate(F.col("_h"), init, _walk)
    got = {r.q: (r.bin, r.n_le) for r in qs.select(
        "q", found["bin"].alias("bin"), found["cum"].alias("n_le")
    ).collect()}
    assert got == {0.5: (1, 5), 0.9: (2, 9), 0.99: (9, 10)}


def test_binned_quantiles_merge_invariant_to_partial_grouping(spark):
    """The mergeability claim itself: the declared query's answer equals
    the same walk computed WITHOUT the daily-partial layer (single direct
    histogram) — partial grouping must be invisible."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    q = entry._queries_unordered()["price_quantiles_from_partials"]
    via_partials = sorted(map(tuple, q(spark, sf).collect()))

    from pyspark.sql import functions as F
    from checkatron_spark.sources.tables import load_table
    orders = load_table(spark, "orders", sf)
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )
    direct_hist = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .select(
            F.floor(cents.cast("double") / F.lit(50000.0))
            .cast("bigint")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .collect()
    )
    import math
    hist = sorted((r.bin, r.n) for r in direct_hist)
    N = sum(n for _, n in hist)
    want = []
    for qv in (0.5, 0.9, 0.99):
        t, cum = math.ceil(qv * N), 0
        for b, n in hist:
            cum += n
            if cum >= t:
                want.append((qv, b, b * 500.0, cum, N))
                break
    assert via_partials == sorted(want)
