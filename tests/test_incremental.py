"""Incremental (checksum-pruned) diff: pruning really prunes, and the result
is exactly the full diff restricted to changed buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark.operators.diff import diff
from checkatron_spark.operators.incremental import (
    changed_buckets,
    diff_incremental,
)
from checkatron_spark.sources.tables import load_table

REQUIRES_TESTDATA = True

SF_DIR = "/root/testdata/sf0.001"
N = 16


def _bucket_expr(df):
    return F.pmod(df["o_orderkey"].cast("bigint"), F.lit(N))


def test_identical_sides_no_changed_buckets(spark):
    orders = load_table(spark, "orders", SF_DIR)
    ch = changed_buckets(orders, orders, _bucket_expr, orders.columns)
    assert ch.count() == 0
    out = diff_incremental(orders, orders, ["o_orderkey"], n_buckets=N)
    assert out.count() == 0


def test_localized_churn_prunes_to_touched_buckets(spark):
    orders = load_table(spark, "orders", SF_DIR)
    # touch ONLY bucket 3: flip status there, leave everything else alone
    after = orders.withColumn(
        "o_orderstatus",
        F.when(
            (F.col("o_orderkey") % N == 3) & (F.col("o_custkey") % 2 == 0),
            F.lit("Z"),
        ).otherwise(F.col("o_orderstatus")),
    )
    ch = sorted(
        r.bucket
        for r in changed_buckets(
            orders, after, _bucket_expr, orders.columns
        ).collect()
    )
    assert ch == [3]
    inc = diff_incremental(orders, after, ["o_orderkey"], n_buckets=N)
    # exactly the full diff restricted to the changed bucket
    full = diff(orders, after, ["o_orderkey"]).filter(
        F.col("K_O_ORDERKEY") % N == 3
    )
    assert sorted(map(tuple, inc.collect())) == sorted(map(tuple, full.collect()))
    # and it still contains both changed AND untouched rows of that bucket
    stat = {r.O_ORDERSTATUS for r in inc.collect()}
    assert stat == {0, 1}


def test_row_drop_changes_bucket_count(spark):
    orders = load_table(spark, "orders", SF_DIR)
    after = orders.filter(
        ~((F.col("o_orderkey") % N == 5) & (F.col("o_orderkey") % 3 == 0))
    )
    ch = sorted(
        r.bucket
        for r in changed_buckets(
            orders, after, _bucket_expr, orders.columns
        ).collect()
    )
    assert ch == [5]
    inc = diff_incremental(orders, after, ["o_orderkey"], n_buckets=N)
    assert inc.filter(F.col("_row_status") == 5).count() > 0
