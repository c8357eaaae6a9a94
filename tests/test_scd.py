"""SCD2 delta operator: change classification on a hand-built dimension
(insert/update/delete/unchanged), single-join plan shape, and stratified
sampling semantics (per-stratum thresholds, zero shuffle)."""

from __future__ import annotations

import pyspark.sql.functions as F

from checkatron_spark.operators.scd import scd2_delta
from checkatron_spark.sampling import stratified_sample


def _dim(spark):
    rows = [
        (1, "ACTIVE", 100.0, "2020-01-01 00:00:00"),   # unchanged
        (2, "ACTIVE", 200.0, "2020-01-01 00:00:00"),   # value change
        (3, "CLOSED", 300.0, "2020-01-01 00:00:00"),   # deleted in updates
        (4, None, 400.0, "2020-01-01 00:00:00"),       # NULL -> value change
        (5, "ACTIVE", None, "2020-01-01 00:00:00"),    # NULL unchanged
    ]
    df = spark.createDataFrame(rows, "k int, status string, bal double, vf string")
    return df.withColumn("valid_from", F.col("vf").cast("timestamp")).drop("vf")


def _upd(spark):
    rows = [
        (1, "ACTIVE", 100.0),
        (2, "ACTIVE", 250.0),
        (4, "FROZEN", 400.0),
        (5, "ACTIVE", None),
        (6, "ACTIVE", 600.0),                          # brand new key
    ]
    return spark.createDataFrame(rows, "k int, status string, bal double")


def _delta(spark):
    return scd2_delta(
        _dim(spark),
        _upd(spark),
        ["k"],
        ["status", "bal"],
        load_ts=F.lit("2021-06-01 00:00:00").cast("timestamp"),
    )


def test_scd2_actions(spark):
    got = {(r.action, r.k) for r in _delta(spark).collect()}
    assert got == {
        ("close", 2), ("insert", 2),    # changed
        ("close", 3),                   # soft delete
        ("close", 4), ("insert", 4),    # NULL -> value counts as change
        ("insert", 6),                  # new key
    }


def test_scd2_versioning_columns(spark):
    rows = {(r.action, r.k): r for r in _delta(spark).collect()}
    close2 = rows[("close", 2)]
    assert not close2.is_current
    assert str(close2.valid_from).startswith("2020-01-01")
    assert str(close2.valid_to).startswith("2021-06-01")
    assert close2.bal == 200.0  # close-out carries the OLD version
    ins2 = rows[("insert", 2)]
    assert ins2.is_current and ins2.valid_to is None
    assert str(ins2.valid_from).startswith("2021-06-01")
    assert ins2.bal == 250.0


def test_scd2_single_join_plan(spark):
    plan = _delta(spark)._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the explode trick must not duplicate the join
    assert plan.count("FullOuter") == 1


def test_stratified_sample_thresholds(spark):
    rows = [(i, "en" if i % 2 == 0 else ("zh" if i % 4 == 1 else "xx"))
            for i in range(400)]
    df = spark.createDataFrame(rows, "id int, lang string")
    kept = stratified_sample(
        df, "id", "lang", {"en": 1.0, "zh": 0.5}
    ).groupBy("lang").count().collect()
    by = {r.lang: r["count"] for r in kept}
    assert by.get("en") == 200          # fraction 1.0 keeps every row
    assert 20 <= by.get("zh", 0) < 100  # ~half of the 100 zh rows
    assert "xx" not in by               # default fraction 0 drops the rest


def test_stratified_sample_no_shuffle(spark):
    df = spark.createDataFrame([(1, "en")], "id int, lang string")
    plan = (
        stratified_sample(df, "id", "lang", {"en": 0.5})
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_pit_join_picks_version_valid_at_event_time(spark):
    from checkatron_spark.operators.scd import pit_join

    hist = spark.createDataFrame(
        [
            (1, "v1", "2024-01-01 00:00:00", "2024-01-10 00:00:00"),
            (1, "v2", "2024-01-10 00:00:00", None),
            (2, "w1", "2024-01-05 00:00:00", None),
        ],
        "k int, tag string, vf string, vt string",
    ).select(
        "k", "tag",
        F.col("vf").cast("timestamp").alias("valid_from"),
        F.col("vt").cast("timestamp").alias("valid_to"),
    )
    facts = spark.createDataFrame(
        [
            (100, 1, "2024-01-05 12:00:00"),  # inside v1
            (101, 1, "2024-01-10 00:00:00"),  # boundary: valid_from inclusive -> v2
            (102, 1, "2024-02-01 00:00:00"),  # open-ended v2
            (103, 2, "2024-01-01 00:00:00"),  # before w1 starts -> no match
        ],
        "fid int, k int, ts string",
    ).select("fid", "k", F.col("ts").cast("timestamp").alias("ts"))

    got = {
        r["fid"]: r["dim_tag"]
        for r in pit_join(facts, hist, ["k"], ts_col="ts").collect()
    }
    assert got == {100: "v1", 101: "v2", 102: "v2", 103: None}
