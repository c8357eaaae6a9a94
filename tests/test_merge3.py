"""Three-way merge diff: per-column codes on a hand-built fixture (all five
codes + presence flags) and the two-join plan shape."""

from __future__ import annotations

from checkatron_spark.operators.merge3 import diff3


def _frames(spark):
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 10), (3, "a", 10), (4, "a", 10),
         (5, "a", 10), (6, "a", 10)],
        "k int, s string, v int",
    )
    ours = spark.createDataFrame(
        [(1, "a", 10),            # unchanged
         (2, "X", 10),            # ours-only change -> 1
         (3, "a", 10),            # theirs changes this one
         (4, "Z", 10),            # both change, same value -> 3
         (5, "P", 10)],           # both change, different -> 4; 6 deleted
        "k int, s string, v int",
    )
    theirs = spark.createDataFrame(
        [(1, "a", 10),
         (2, "a", 10),
         (3, "Y", 10),            # theirs-only change -> 2
         (4, "Z", 10),
         (5, "Q", 10),
         (6, "a", 10),
         (7, "n", 99)],           # brand-new key in theirs only
        "k int, s string, v int",
    )
    return base, ours, theirs


def _result(spark):
    base, ours, theirs = _frames(spark)
    return diff3(base, ours, theirs, ["k"], ["s", "v"])


def test_diff3_column_codes(spark):
    rows = {r.K_K: r for r in _result(spark).collect()}
    assert rows[1].S == 0 and rows[1].V == 0
    assert rows[2].S == 1
    assert rows[3].S == 2
    assert rows[4].S == 3
    assert rows[5].S == 4
    # delete in ours: base 'a' vs ours NULL = ours change; theirs unchanged
    assert rows[6].S == 1 and rows[6].V == 1
    assert not rows[6].in_ours and rows[6].in_base and rows[6].in_theirs
    # new key in theirs: base NULL vs theirs 'n' = theirs-only change
    assert rows[7].S == 2 and rows[7].V == 2
    assert rows[7].in_theirs and not rows[7].in_base and not rows[7].in_ours


def test_diff3_plan_two_joins_no_cartesian(spark):
    plan = _result(spark)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FullOuter") == 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
