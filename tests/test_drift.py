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
