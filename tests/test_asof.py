"""As-of join: inclusive most-recent-prior matching, per-key isolation,
tolerance windows, and the one-shuffle plan shape."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from checkatron_spark.operators.asof import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), "l1"),
            (1, _ts("2024-01-01T12:00:00"), "l2"),
            (2, _ts("2024-01-01T10:30:00"), "l3"),
            (3, _ts("2024-01-01T09:00:00"), "l4"),  # key with no right rows
        ],
        ["k", "ts", "name"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:00:00"), 1.0),
            (1, _ts("2024-01-01T10:00:00"), 2.0),  # equal ts -> inclusive match
            (1, _ts("2024-01-01T11:00:00"), 3.0),
            (2, _ts("2024-01-01T10:00:00"), 4.0),
        ],
        ["k", "ts", "v"],
    )
    return left, right


def test_asof_basic(spark):
    left, right = _frames(spark)
    got = {
        r.name: r.asof_v
        for r in asof_join(
            left, right, on="ts", by=["k"], value_cols=["v"]
        ).collect()
    }
    assert got == {"l1": 2.0, "l2": 3.0, "l3": 4.0, "l4": None}


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    got = {
        r.name: r.asof_v
        for r in asof_join(
            left, right, on="ts", by=["k"], value_cols=["v"],
            tolerance="30 minutes",
        ).collect()
    }
    # l2's best match (11:00) is 60 min old -> nulled; l1/l3 within 30 min
    assert got == {"l1": 2.0, "l2": None, "l3": 4.0, "l4": None}


def test_asof_keeps_all_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=["k"], value_cols=["v"])
    assert out.columns == ["k", "ts", "name", "asof_v"]
    assert out.count() == left.count()


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="ts", by=["k"], value_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + one window over the key: exactly ONE exchange, no joins
    assert plan.count("Exchange") == 1, plan[:2000]
    assert "Join" not in plan
