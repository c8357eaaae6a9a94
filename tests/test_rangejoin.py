"""Binned range join: exactness against a brute-force condition join,
boundary semantics, and the no-nested-loop plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from checkatron_spark.operators.rangejoin import range_join_binned

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _frames(spark):
    points = spark.createDataFrame(
        [(i, T0 + timedelta(minutes=7 * i)) for i in range(200)], ["pid", "ts"]
    )
    intervals = spark.createDataFrame(
        [
            (j, T0 + timedelta(minutes=45 * j), T0 + timedelta(minutes=45 * j + 90))
            for j in range(20)
        ],
        ["iid", "w_start", "w_end"],
    )
    return points, intervals


def test_matches_bruteforce(spark):
    points, intervals = _frames(spark)
    got = {
        (r.pid, r.iid)
        for r in range_join_binned(
            points, intervals, point_ts="ts", start_ts="w_start",
            end_ts="w_end", bin_seconds=1800,
        ).collect()
    }
    brute = {
        (r.pid, r.iid)
        for r in points.join(
            intervals,
            (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")),
        ).collect()
    }
    assert got == brute and len(got) > 0


def test_boundaries(spark):
    points = spark.createDataFrame(
        [(1, T0), (2, T0 + timedelta(hours=2)), (3, T0 + timedelta(hours=1))],
        ["pid", "ts"],
    )
    intervals = spark.createDataFrame(
        [(10, T0, T0 + timedelta(hours=2))], ["iid", "w_start", "w_end"]
    )
    got = {
        r.pid
        for r in range_join_binned(
            points, intervals, point_ts="ts", start_ts="w_start",
            end_ts="w_end",
        ).collect()
    }
    assert got == {1, 3}  # start inclusive, end exclusive


def test_plan_is_equijoin(spark):
    points, intervals = _frames(spark)
    out = range_join_binned(
        points, intervals, point_ts="ts", start_ts="w_start", end_ts="w_end"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
