"""Observability without extra scans: Spark's Observation API collects
summary metrics during the action that writes the diff — the reference's
separate validation aggregation (/root/reference/tools/step_ledger.py:253-259)
as a zero-cost side effect — and join-strategy hints stay honored on the
diff's join."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Observation

from checkatron_spark import diff


def _snapshots(spark):
    b = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, "z")], "k int, v string"
    )
    a = spark.createDataFrame(
        [(1, "x"), (2, "CHANGED"), (4, "new")], "k int, v string"
    )
    return b, a


def test_observe_diff_metrics_single_pass(spark):
    b, a = _snapshots(spark)
    d = diff(b, a, ["k"])
    obs = Observation("diff_metrics")
    observed = d.observe(
        obs,
        F.count(F.lit(1)).alias("total_rows"),
        F.count_if(F.col("_row_status") == 4).alias("missing_in_before"),
        F.count_if(F.col("_row_status") == 5).alias("missing_in_after"),
        F.count_if(F.col("_row_status").isNull() & (F.col("V") == 1)).alias(
            "changed_rows"
        ),
    )
    # one action drives BOTH the result write and the metrics
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got == {
        "total_rows": 4,
        "missing_in_before": 1,
        "missing_in_after": 1,
        "changed_rows": 1,
    }


def test_diff_join_strategy_hints_are_honored(spark):
    b, a = _snapshots(spark)
    merged = diff(b, a.hint("merge"), ["k"])
    plan = merged._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan

    hashed = diff(b, a.hint("shuffle_hash"), ["k"])
    hplan = hashed._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in hplan

    # a full-outer join cannot build a broadcast side — Spark must IGNORE
    # the hint (logged as unsupported) rather than produce a wrong plan
    broadcast = diff(b, F.broadcast(a), ["k"])
    bplan = broadcast._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" not in bplan
