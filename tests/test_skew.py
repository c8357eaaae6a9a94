"""Salted aggregation: result equivalence with plain groupBy and the
two-exchange plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark.operators.skew import salted_agg, with_salt


def _skewed(spark):
    # one hot key (90%) + a long tail
    hot = spark.range(900).select(F.lit("HOT").alias("k"), F.col("id").alias("v"))
    tail = spark.range(100).select(
        F.concat(F.lit("t"), F.col("id") % 20).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(tail)


def test_salted_agg_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r.k: (r.n, r.s)
        for r in salted_agg(
            df, ["k"],
            [F.count(F.lit(1)).alias("_n"), F.sum("v").alias("_s")],
            [F.sum("_n").alias("n"), F.sum("_s").alias("s")],
            buckets=8,
        ).collect()
    }
    assert salted == plain


def test_salt_is_deterministic_and_bounded(spark):
    df = with_salt(_skewed(spark), buckets=8)
    a = sorted(map(tuple, df.collect()))
    b = sorted(map(tuple, with_salt(_skewed(spark), buckets=8).collect()))
    assert a == b  # content-derived, not rand()
    salts = {r._salt for r in df.select("_salt").distinct().collect()}
    assert salts <= set(range(8)) and len(salts) > 1


def test_salted_plan_has_two_exchanges(spark):
    out = salted_agg(
        _skewed(spark), ["k"],
        [F.count(F.lit(1)).alias("_n")],
        [F.sum("_n").alias("n")],
        buckets=8,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 2  # (key,salt) then key


def test_salted_join_equals_plain_join(spark):
    from checkatron_spark.operators.skew import salted_join

    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (1, "c"), (2, "d"), (3, "e")], "k int, v string"
    )
    right = spark.createDataFrame([(1, 10), (2, 20), (9, 90)], "k int, w int")
    got = salted_join(left, right, ["k"], buckets=4)
    exp = left.join(right, ["k"], "inner")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_salted_left_join_keeps_unmatched_once(spark):
    from checkatron_spark.operators.skew import salted_join

    left = spark.createDataFrame([(1, "a"), (7, "z")], "k int, v string")
    right = spark.createDataFrame([(1, 10)], "k int, w int")
    got = salted_join(left, right, ["k"], buckets=4, how="left")
    rows = sorted(map(tuple, got.collect()))
    assert rows == [(1, "a", 10), (7, "z", None)]


def test_salted_join_rejects_outer(spark):
    import pytest

    from checkatron_spark.operators.skew import salted_join

    df = spark.range(1)
    with pytest.raises(ValueError):
        salted_join(df, df, ["id"], how="full_outer")
