"""assign_dense_ids: exact global ordinals without a single-partition
window. Ground truth is the naive partition-less row_number spelling —
fine at test scale, the exact shape the operator exists to avoid."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from checkatron_spark.operators.ids import assign_dense_ids


def _naive(df, order_col, tiebreaks=()):
    order = [F.col(order_col).asc_nulls_first()] + [
        F.col(t).asc_nulls_first() for t in tiebreaks
    ]
    return df.withColumn(
        "dense_id", F.row_number().over(Window.orderBy(*order)).cast("bigint")
    )


def _check(df, order_col, tiebreaks=(), **kw):
    got = {
        tuple(r)
        for r in assign_dense_ids(df, order_col, tiebreaks, **kw).collect()
    }
    want = {tuple(r) for r in _naive(df, order_col, tiebreaks).collect()}
    assert got == want


def test_unique_key_matches_naive(spark):
    df = spark.range(0, 500).select(
        ((F.col("id") * 37) % 1000).alias("k")
    ).distinct()
    _check(df, "k", buckets=8)


def test_duplicate_keys_and_tiebreak(spark):
    # k has heavy ties (only 7 distinct values over 300 rows); ties must
    # share a bucket and order by the tiebreak inside it
    df = spark.range(0, 300).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("tb")
    )
    _check(df, "k", ("tb",), buckets=16)


def test_nulls_sort_first(spark):
    rows = [(None, i) if i % 3 == 0 else (float(i % 5), i) for i in range(60)]
    df = spark.createDataFrame(rows, "k double, tb int")
    out = assign_dense_ids(df, "k", ("tb",), buckets=4).collect()
    want = {tuple(r) for r in _naive(df, "k", ("tb",)).collect()}
    assert {tuple(r) for r in out} == want
    # every NULL-key ordinal precedes every non-NULL-key ordinal
    null_max = max(r["dense_id"] for r in out if r["k"] is None)
    nonnull_min = min(r["dense_id"] for r in out if r["k"] is not None)
    assert null_max < nonnull_min


@pytest.mark.parametrize("buckets", [1, 2, 1000])
def test_bucket_count_never_changes_result(spark, buckets):
    # more buckets than rows, a single bucket, and a normal setting all
    # yield the identical ordinal — boundaries affect balance only
    df = spark.range(0, 97).select(
        ((F.col("id") * 13) % 50).alias("k"), F.col("id").alias("tb")
    )
    _check(df, "k", ("tb",), buckets=buckets)


def test_many_buckets_broadcast_join_path(spark):
    # >256 surviving buckets takes the broadcast-join offset fold instead
    # of the map-literal — result must be identical
    df = spark.range(0, 2000).select(F.col("id").alias("k"))
    _check(df, "k", buckets=1000)


def test_non_numeric_order_column_raises(spark):
    df = spark.range(0, 5).select(F.col("id").cast("string").alias("k"))
    with pytest.raises(TypeError, match="numeric order column"):
        assign_dense_ids(df, "k")


def test_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    assert assign_dense_ids(df, "k", buckets=8).count() == 0


def test_ordinals_are_dense_and_unique(spark):
    df = spark.range(0, 1000).select(((F.col("id") * 7919) % 100000).alias("k"))
    ids = sorted(
        r["dense_id"] for r in assign_dense_ids(df, "k", buckets=32).collect()
    )
    assert ids == list(range(1, df.count() + 1))


@given(
    keys=st.lists(
        st.one_of(st.none(), st.integers(-5, 5)), min_size=1, max_size=60
    ),
    buckets=st.sampled_from([1, 3, 7]),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_property_matches_naive_under_dups_and_nulls(spark, keys, buckets):
    """Any mix of duplicate and NULL keys, any bucket count: the ordinal
    equals the naive global row_number under (key NULLS FIRST, tiebreak)."""
    rows = [(k, i) for i, k in enumerate(keys)]
    df = spark.createDataFrame(rows, "k int, tb int")
    _check(df, "k", ("tb",), buckets=buckets)


def test_all_null_order_column(spark):
    # every row in the NULL bucket: ordinals come purely from tiebreaks
    df = spark.createDataFrame([(None, i) for i in range(7)], "k double, tb int")
    out = sorted((r.tb, r.dense_id) for r in
                 assign_dense_ids(df, "k", ("tb",), buckets=4).collect())
    assert out == [(i, i + 1) for i in range(7)]


def test_nan_sorts_last_matching_spark_order(spark):
    """Spark treats NaN as greater than any numeric in BOTH comparisons and
    sorts, so `v >= cut` routes NaN to the top bucket — exactly where the
    naive window puts it. NULL < numbers < NaN end to end."""
    df = spark.createDataFrame(
        [(float("nan"), 0), (1.0, 1), (None, 2), (2.0, 3)], "k double, tb int"
    )

    def norm(rows):  # NaN != NaN in Python; stringify for set compare
        return {(str(r.k), r.tb, r.dense_id) for r in rows}

    got = norm(assign_dense_ids(df, "k", ("tb",), buckets=4).collect())
    want = norm(_naive(df, "k", ("tb",)).collect())
    assert got == want
    by_id = {r.dense_id: r.k for r in
             assign_dense_ids(df, "k", ("tb",), buckets=4).collect()}
    assert by_id[1] is None and str(by_id[4]) == "nan"


def test_null_bearing_tiebreak_pins_nulls_first(spark):
    """Tiebreak NULL placement is part of the contract (ADVICE r7): NULL
    tiebreaks sort FIRST within an order-value tie, matching the documented
    ASC NULLS FIRST — not DuckDB's plain-ASC NULLS LAST default."""
    rows = [(1, None), (1, 5), (1, 2), (0, None), (0, 9), (2, 1)]
    df = spark.createDataFrame(
        [(k, tb, i) for i, (k, tb) in enumerate(rows)], "k int, tb int, pk int"
    )
    _check(df, "k", ("tb", "pk"), buckets=4)
    by_pk = {
        r.pk: r.dense_id
        for r in assign_dense_ids(df, "k", ("tb", "pk"), buckets=4).collect()
    }
    assert by_pk[3] < by_pk[4]  # (0, NULL) before (0, 9)
    assert by_pk[0] < by_pk[2]  # (1, NULL) before (1, 2)


@given(
    cuts=st.lists(
        st.integers(-50, 50).map(float), min_size=65, max_size=120, unique=True
    ),
    vals=st.lists(
        st.one_of(st.just(float("nan")), st.integers(-60, 60).map(float)),
        min_size=1,
        max_size=30,
    ),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_binary_search_bucketing_equals_flat_scan(spark, cuts, vals):
    """The O(log cuts) binary-search bucket id (taken above
    _FLAT_SCAN_MAX_CUTS cut points) computes exactly `count(c <= v)` — the
    flat filter's answer — for every value, including NaN (top bucket)."""
    from checkatron_spark.operators.ids import _FLAT_SCAN_MAX_CUTS, _n_cuts_below

    cuts = sorted(cuts)
    assert len(cuts) > _FLAT_SCAN_MAX_CUTS
    df = spark.createDataFrame([(x,) for x in vals], "v double")
    got = [
        r.b
        for r in df.select(
            _n_cuts_below(F.col("v"), cuts).alias("b")
        ).collect()
    ]
    want = [
        len(cuts) if v != v else sum(1 for c in cuts if v >= c) for v in vals
    ]
    assert got == want


def test_no_single_partition_window_in_plan(spark):
    df = spark.range(0, 100).select(F.col("id").alias("k"))
    plan = assign_dense_ids(df, "k", buckets=8)._jdf.queryExecution().optimizedPlan()

    def _iter(node):
        yield node
        for i in range(node.children().size()):
            yield from _iter(node.children().apply(i))

    for node in _iter(plan):
        if node.getClass().getSimpleName() == "Window":
            assert node.partitionSpec().size() > 0, (
                "assign_dense_ids planned a partition-less window — the "
                "single-task funnel it exists to avoid"
            )
