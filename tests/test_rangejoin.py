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


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------

def _iv(spark, rows, s, e):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, f"iid int, {s} string, {e} string")
    return df.select(
        "iid", F.to_timestamp(s).alias(s), F.to_timestamp(e).alias(e)
    )


def test_interval_overlap_multibin_pair_counted_once(spark):
    """Two long intervals sharing MANY hour bins must emit their pair
    exactly once (later-start-bin attribution, no distinct)."""
    from checkatron_spark.operators.rangejoin import interval_overlap_join

    left = _iv(spark, [(1, "2024-01-01 00:30:00", "2024-01-01 09:30:00")],
               "ls", "le")
    right = _iv(spark, [(10, "2024-01-01 01:15:00", "2024-01-01 08:45:00")],
                "rs", "re")
    out = interval_overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        rsuffix="_r",
    ).collect()
    assert len(out) == 1  # 8+ shared hour bins, ONE pair


def test_interval_overlap_matches_naive_theta_join(spark):
    """Randomized-ish small set: binned result set == the exact theta
    join, including point intervals and closed-boundary touches."""
    from pyspark.sql import functions as F

    from checkatron_spark.operators.rangejoin import interval_overlap_join

    lrows = [
        (1, "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
        (2, "2024-01-01 05:00:00", "2024-01-01 05:00:00"),  # point
        (3, "2024-01-01 03:00:00", "2024-01-01 10:00:00"),
        (4, "2024-01-02 00:00:00", "2024-01-02 01:00:00"),
    ]
    rrows = [
        (10, "2024-01-01 02:00:00", "2024-01-01 04:00:00"),  # touches 1 & 3
        (11, "2024-01-01 04:30:00", "2024-01-01 05:00:00"),  # touches point 2
        (12, "2024-01-01 23:00:00", "2024-01-02 00:00:00"),  # touches 4
        (13, "2024-01-03 00:00:00", "2024-01-03 01:00:00"),  # no match
    ]
    left = _iv(spark, lrows, "ls", "le")
    right = _iv(spark, rrows, "rs", "re")
    got = sorted(
        (r.iid, r.iid_r)
        for r in interval_overlap_join(
            left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
            rsuffix="_r",
        ).collect()
    )
    naive = sorted(
        (r[0], r[1])
        for r in left.alias("l")
        .join(
            right.alias("r"),
            (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
        )
        .select(F.col("l.iid"), F.col("r.iid"))
        .collect()
    )
    assert got == naive
    # the touches are real: 1-10 (end==start), 2-11 (point at boundary)
    assert (1, 10) in got and (2, 11) in got and (4, 12) in got
    assert not any(b == 13 for _, b in got)


def test_interval_overlap_property_fuzz_vs_theta(spark):
    """Property fuzz of the later-start-bin attribution: for arbitrary
    interval sets (degenerate points, bin-boundary endpoints, long spans,
    disjoint tails), the binned join's multiset of pairs equals the naive
    theta join exactly — no duplicate from shared bins, no pair lost at a
    bin edge. Deterministic arithmetic fixture, 3 seeds."""
    from checkatron_spark.operators.rangejoin import interval_overlap_join

    for seed in (1, 2, 3):
        def mk(n, salt):
            rows = []
            for i in range(n):
                # starts land on/off bin boundaries; lengths 0..5h
                start = T0 + timedelta(
                    minutes=(i * 97 + salt * 31 + seed * 13) % (60 * 48)
                )
                length = timedelta(minutes=((i * 53 + salt) % 7) * 50)
                rows.append((i + salt * 1000, start, start + length))
            return spark.createDataFrame(rows, "iid int, s timestamp, e timestamp")

        left = mk(25, 1).withColumnRenamed("s", "ls").withColumnRenamed("e", "le")
        right = mk(20, 2).withColumnRenamed("s", "rs").withColumnRenamed("e", "re")
        got = sorted(
            (r.iid, r.iid_r)
            for r in interval_overlap_join(
                left, right, l_start="ls", l_end="le",
                r_start="rs", r_end="re", rsuffix="_r",
            ).collect()
        )
        naive = sorted(
            (r[0], r[1])
            for r in left.join(
                right,
                (F.col("ls") <= F.col("re")) & (F.col("rs") <= F.col("le")),
            )
            .select(left["iid"], right["iid"])
            .collect()
        )
        assert got == naive, f"seed {seed}: {len(got)} vs {len(naive)}"
        assert len(got) == len(set(got))  # no pair duplicated


# ---------------------------------------------------------------------------
# guards: bins-per-interval cap, duplicate-column refusal (round 9)
# ---------------------------------------------------------------------------

def test_long_interval_raises_instead_of_exploding(spark):
    """A single year-long interval at 1-hour bins would be 8,760 explode
    copies — the guard must raise (with the bounds in the message) before
    the blowup materializes, not after."""
    import pytest
    from pyspark.errors import SparkRuntimeException

    from checkatron_spark.operators.rangejoin import interval_overlap_join

    left = _iv(spark, [(1, "2024-01-01 00:00:00", "2025-01-01 00:00:00")],
               "ls", "le")
    right = _iv(spark, [(10, "2024-06-01 00:00:00", "2024-06-01 01:00:00")],
                "rs", "re")
    with pytest.raises(SparkRuntimeException, match="max_bins_per_interval"):
        interval_overlap_join(
            left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
            rsuffix="_r",
        ).collect()
    # raising the cap (or the bin width) admits the same data
    out = interval_overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        rsuffix="_r", max_bins_per_interval=10000,
    ).collect()
    assert [(r.iid, r.iid_r) for r in out] == [(1, 10)]


def test_range_join_binned_long_interval_raises(spark):
    import pytest
    from pyspark.errors import SparkRuntimeException

    from checkatron_spark.operators.rangejoin import range_join_binned

    points = spark.createDataFrame([(1, T0)], ["pid", "ts"])
    intervals = spark.createDataFrame(
        [(10, T0 - timedelta(days=400), T0 + timedelta(days=400))],
        ["iid", "w_start", "w_end"],
    )
    with pytest.raises(SparkRuntimeException, match="max_bins_per_interval"):
        range_join_binned(
            points, intervals, point_ts="ts", start_ts="w_start",
            end_ts="w_end",
        ).collect()


def test_null_endpoint_interval_still_dropped_not_raised(spark):
    """NULL-endpoint intervals keep the pre-guard semantics: dropped by
    the NULL sequence, never counted against the bins cap."""
    from checkatron_spark.operators.rangejoin import interval_overlap_join

    left = spark.createDataFrame(
        [(1, T0, None), (2, T0, T0 + timedelta(hours=1))],
        "iid int, ls timestamp, le timestamp",
    )
    right = _iv(spark, [(10, "2024-01-01 00:30:00", "2024-01-01 02:00:00")],
                "rs", "re")
    out = interval_overlap_join(
        left, right, l_start="ls", l_end="le", r_start="rs", r_end="re",
        rsuffix="_r",
    ).collect()
    assert [(r.iid, r.iid_r) for r in out] == [(2, 10)]


def test_shared_column_names_raise_without_rsuffix(spark):
    import pytest

    from checkatron_spark.operators.rangejoin import interval_overlap_join

    left = _iv(spark, [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
               "ls", "le")
    right = _iv(spark, [(10, "2024-01-01 00:30:00", "2024-01-01 02:00:00")],
                "rs", "re")
    with pytest.raises(ValueError, match="iid"):
        interval_overlap_join(
            left, right, l_start="ls", l_end="le", r_start="rs", r_end="re"
        )


def test_rsuffix_renames_clashing_bound_columns(spark):
    """rsuffix must track r_start/r_end themselves when BOTH sides use
    the same bound names."""
    from checkatron_spark.operators.rangejoin import interval_overlap_join

    left = _iv(spark, [(1, "2024-01-01 00:00:00", "2024-01-01 01:00:00")],
               "s", "e")
    right = _iv(spark, [(10, "2024-01-01 00:30:00", "2024-01-01 02:00:00")],
                "s", "e")
    out = interval_overlap_join(
        left, right, l_start="s", l_end="e", r_start="s", r_end="e",
        rsuffix="_r",
    )
    assert sorted(out.columns) == ["e", "e_r", "iid", "iid_r", "s", "s_r"]
    assert [(r.iid, r.iid_r) for r in out.collect()] == [(1, 10)]


def test_auto_bin_seconds_derives_median_and_matches_fixed(spark):
    """VERDICT r9 #5: bin_seconds=None derives the width from the MEDIAN
    interval length in one aggregate — on a mixed short/long interval set
    the derived width must sit at the median (not the mean, which the
    long tail would drag up), and both operators must return the same
    exact rows as an explicitly-tuned run (width is a performance knob,
    never a correctness input)."""
    from checkatron_spark.operators.rangejoin import (
        _auto_bin_seconds,
        interval_overlap_join,
        range_join_binned,
    )

    # 9 x 10-minute intervals + 2 x 12-hour outliers: median 600 s,
    # mean ~7.6 ks — the auto width must pick the median
    ivs = [
        (j, T0 + timedelta(minutes=30 * j),
         T0 + timedelta(minutes=30 * j + 10))
        for j in range(9)
    ] + [
        (90, T0, T0 + timedelta(hours=12)),
        (91, T0 + timedelta(hours=1), T0 + timedelta(hours=13)),
    ]
    intervals = spark.createDataFrame(ivs, ["iid", "w_start", "w_end"])
    w = _auto_bin_seconds([(intervals, "w_start", "w_end")])
    assert w == 600, w

    points = spark.createDataFrame(
        [(i, T0 + timedelta(minutes=3 * i)) for i in range(300)],
        ["pid", "ts"],
    )
    fixed = range_join_binned(
        points, intervals, point_ts="ts", start_ts="w_start",
        end_ts="w_end", bin_seconds=600,
    )
    auto = range_join_binned(
        points, intervals, point_ts="ts", start_ts="w_start",
        end_ts="w_end", bin_seconds=None,
    )
    key = lambda r: (r["pid"], r["iid"])  # noqa: E731
    assert sorted(map(key, auto.collect())) == sorted(
        map(key, fixed.collect())
    )

    right = spark.createDataFrame(
        [(j, T0 + timedelta(minutes=25 * j),
          T0 + timedelta(minutes=25 * j + 40)) for j in range(12)],
        ["rid", "r_s", "r_e"],
    )
    ofixed = interval_overlap_join(
        intervals, right, l_start="w_start", l_end="w_end",
        r_start="r_s", r_end="r_e", bin_seconds=900,
    )
    oauto = interval_overlap_join(
        intervals, right, l_start="w_start", l_end="w_end",
        r_start="r_s", r_end="r_e", bin_seconds=None,
    )
    okey = lambda r: (r["iid"], r["rid"])  # noqa: E731
    assert sorted(map(okey, oauto.collect())) == sorted(
        map(okey, ofixed.collect())
    )


def test_auto_bin_seconds_degenerate_inputs_fall_back(spark):
    """No measurable intervals (all NULL endpoints / negative lengths /
    empty) must fall back to the 3600 s default, not crash or derive 0."""
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType,
    )

    from checkatron_spark.operators.rangejoin import _auto_bin_seconds

    schema = StructType([
        StructField("iid", LongType()),
        StructField("s", TimestampType()),
        StructField("e", TimestampType()),
    ])
    empty = spark.createDataFrame([], schema)
    assert _auto_bin_seconds([(empty, "s", "e")]) == 3600
    nulls = spark.createDataFrame([(1, None, None), (2, T0, None)], schema)
    assert _auto_bin_seconds([(nulls, "s", "e")]) == 3600
    # all-degenerate [t, t] intervals: median 0 -> fall back, never bin 0
    points_like = spark.createDataFrame([(1, T0, T0)], schema)
    assert _auto_bin_seconds([(points_like, "s", "e")]) == 3600


def test_auto_bin_seconds_never_trips_its_own_explode_guard(spark):
    """Review r10: a skewed length distribution (median 60 s, one day-long
    outlier) must not derive a width the max_bins_per_interval guard then
    rejects — the width is floored at ceil(max_len / (max_bins - 2)), and
    the join must run to completion in auto mode."""
    from checkatron_spark.operators.rangejoin import (
        _auto_bin_seconds,
        range_join_binned,
    )

    ivs = [
        (j, T0 + timedelta(minutes=10 * j),
         T0 + timedelta(minutes=10 * j, seconds=60))
        for j in range(9)
    ] + [(99, T0, T0 + timedelta(days=1))]
    intervals = spark.createDataFrame(ivs, ["iid", "w_start", "w_end"])
    w = _auto_bin_seconds([(intervals, "w_start", "w_end")], 1024)
    assert w == 85, w  # ceil(86400 / 1022), not the 60s median
    points = spark.createDataFrame(
        [(i, T0 + timedelta(minutes=5 * i)) for i in range(50)],
        ["pid", "ts"],
    )
    out = range_join_binned(
        points, intervals, point_ts="ts", start_ts="w_start",
        end_ts="w_end", bin_seconds=None,
    )
    brute = points.crossJoin(intervals).filter(
        (F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end"))
    )
    key = lambda r: (r["pid"], r["iid"])  # noqa: E731
    assert sorted(map(key, out.collect())) == sorted(
        map(key, brute.collect())
    )
