"""ORC source/sink parity: Spark ships the ORC reader/writer natively, so
snapshots stored as ORC diff exactly like parquet ones — the engine is
format-agnostic at the DataFrame boundary."""

from __future__ import annotations

import os

import pytest

from checkatron_spark import diff, diff_summary

REQUIRES_TESTDATA = True

SF = "/root/testdata/sf0.001"


def test_orc_roundtrip_and_diff(spark, tmp_path):
    if not os.path.isdir(SF):
        pytest.skip("driver parquet fixtures not available")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orc_path = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(orc_path)

    back = spark.read.orc(orc_path)
    assert back.schema == orders.schema
    assert back.count() == orders.count()

    # a snapshot stored as ORC diffs cleanly against its parquet twin
    d = diff(orders, back, ["o_orderkey"])
    s = diff_summary(d).collect()[0]
    assert s["total_rows"] == orders.count()
    assert s["changed_rows"] == 0
    assert s["missing_in_before"] == 0 and s["missing_in_after"] == 0


def test_orc_predicate_pushdown(spark, tmp_path):
    if not os.path.isdir(SF):
        pytest.skip("driver parquet fixtures not available")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    orc_path = str(tmp_path / "orders_orc2")
    orders.write.mode("overwrite").orc(orc_path)
    q = spark.read.orc(orc_path).filter("o_orderkey = 42").select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_orderkey" in plan
