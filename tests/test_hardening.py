"""Phase-3 hardening: key-uniqueness guards, tolerance comparisons,
differences-only sink, and the bucketed zero-shuffle diff plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from checkatron_spark import diff
from checkatron_spark.operators.guard import (
    DuplicateKeyError,
    assert_unique_keys,
    duplicate_keys,
)
from checkatron_spark.sources.tables import (
    non_matching,
    save_bucketed,
    write_differences_only,
)


def test_duplicate_keys_detects_fanout(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (None, "d"), (None, "e")],
        ["k", "v"],
    )
    dups = {tuple(r)[:1]: r.n_rows for r in duplicate_keys(df, ["k"]).collect()}
    assert dups == {(1,): 2, (None,): 2}  # NULL keys group (eqNullSafe parity)
    with pytest.raises(DuplicateKeyError, match="non-unique"):
        assert_unique_keys(df, ["k"], side="before")
    ok = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    assert_unique_keys(ok, ["k"])  # no raise


def test_tolerance_comparison(spark):
    before = spark.createDataFrame([(1, 10.00), (2, 5.0)], ["k", "amt"])
    after = spark.createDataFrame([(1, 10.004), (2, 5.2)], ["k", "amt"])
    strict = {r.K_K: r.AMT for r in diff(before, after, ["k"]).collect()}
    assert strict == {1: 1, 2: 1}
    tol = {
        r.K_K: r.AMT
        for r in diff(before, after, ["k"], tolerances={"amt": 0.01}).collect()
    }
    assert tol == {1: 0, 2: 1}  # 0.004 within tolerance, 0.2 not


def test_ts_trunc_comparison(spark):
    rows_b = [(1, "2024-01-01 10:00:00.100")]
    rows_a = [(1, "2024-01-01 10:00:00.900")]
    mk = lambda rows: spark.createDataFrame(rows, ["k", "ts_str"]).select(  # noqa: E731
        "k", F.to_timestamp("ts_str").alias("ts")
    )
    assert diff(mk(rows_b), mk(rows_a), ["k"]).collect()[0].TS == 1
    assert (
        diff(mk(rows_b), mk(rows_a), ["k"], ts_trunc="second").collect()[0].TS == 0
    )


def test_differences_only_sink(spark, tmp_path):
    before = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    after = spark.createDataFrame([(1, "a"), (2, "X"), (4, "d")], ["k", "v"])
    d = diff(before, after, ["k"])
    assert non_matching(d).count() == 3  # changed(2) + missing(3) + new(4)
    out = str(tmp_path / "diffs")
    write_differences_only(d, out)
    persisted = spark.read.parquet(out)
    assert persisted.count() == 3
    assert set(persisted.columns) == set(d.columns)


def test_bucketed_diff_has_no_exchange(spark, tmp_path):
    """The repeated-diff-at-scale strategy: both snapshots bucketed+sorted on
    the key => the full-outer sort-merge join reads co-located buckets with
    ZERO Exchange operators in the physical plan."""
    import shutil

    for t in ("bt_before", "bt_after"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    n = 1000
    base = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    changed = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 10 == 0, F.col("id") * 3)
        .otherwise(F.col("id") * 2)
        .alias("v"),
    )
    save_bucketed(base, "bt_before", ["k"], buckets=8)
    save_bucketed(changed, "bt_after", ["k"], buckets=8)

    # null_safe_keys=False is required: <=> compiles to composite
    # (coalesce, isnull) join keys that can never match the bucket spec
    d = diff(
        spark.table("bt_before"), spark.table("bt_after"), ["k"],
        null_safe_keys=False,
    )
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed diff still shuffles:\n{plan[:3000]}"
    assert "Bucketed: true" in plan
    counts = {r.V: r["cnt"] for r in d.groupBy("V").agg(F.count("*").alias("cnt")).collect()}
    # id=0 is "changed" to 0*3 == 0*2, so it still matches
    assert counts == {0: n - n // 10 + 1, 1: n // 10 - 1}


def test_diff_empty_sides(spark):
    """Empty before, empty after, and both-empty diffs must be well-formed
    (every row 4/5, or zero rows) — the degenerate cases a scheduler can
    feed a diff job."""
    full = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    empty = spark.createDataFrame([], "k int, v string")

    d1 = diff(empty, full, ["k"])
    assert d1.count() == 2
    assert d1.filter("_row_status = 4").count() == 2

    d2 = diff(full, empty, ["k"])
    assert d2.filter("_row_status = 5").count() == 2

    d3 = diff(empty, empty, ["k"])
    assert d3.count() == 0
    assert d3.columns == ["_row_status", "K_K", "K", "V"]


def test_compact_parquet(spark, tmp_path):
    """Compaction: many tiny files in -> size-targeted file count out,
    identical rows."""
    from checkatron_spark.sources.tables import compact_parquet, load_table

    src = str(tmp_path / "shattered")
    dst = str(tmp_path / "compacted")
    orders = load_table(spark, "orders", "/root/testdata/sf0.001")
    orders.repartition(64).write.parquet(src)  # 64 tiny files
    import pathlib
    assert len(list(pathlib.Path(src).glob("*.parquet"))) >= 32
    n = compact_parquet(spark, src, dst, target_file_mb=256)
    assert n == 1  # tiny dataset fits one 256MB target file
    assert len(list(pathlib.Path(dst).glob("*.parquet"))) == 1
    a = sorted(r.o_orderkey for r in spark.read.parquet(dst).collect())
    b = sorted(r.o_orderkey for r in orders.collect())
    assert a == b


def test_nullsafe_bucketed_diff_has_no_exchange(spark, tmp_path):
    """VERDICT r6 item 5: the DEFAULT (null-safe) diff used to pay a full
    shuffle even on bucketed snapshots, because `<=>` compiles to
    composite keys no bucket spec can match. save_bucketed(null_safe=True)
    materializes (coalesce(k, sentinel), isnull(k)) pairs and buckets on
    them; the diff joins on those physical columns — zero Exchange, and
    the output is bit-identical to the unbucketed null-safe diff,
    including NULL-key rows pairing NULL<=>NULL."""
    import shutil

    for t in ("nsb_before", "nsb_after"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        shutil.rmtree(f"{loc}/{t}", ignore_errors=True)
    n = 500
    base = spark.range(n).select(
        # every 50th key is NULL -> those rows must pair via NULL<=>NULL
        F.when(F.col("id") % 50 == 0, None).otherwise(F.col("id")).alias("k"),
        (F.col("id") * 2).alias("v"),
    )
    changed = spark.range(n).select(
        F.when(F.col("id") % 50 == 0, None).otherwise(F.col("id")).alias("k"),
        F.when(F.col("id") % 10 == 0, F.col("id") * 3)
        .otherwise(F.col("id") * 2)
        .alias("v"),
    )
    save_bucketed(base, "nsb_before", ["k"], buckets=8, null_safe=True)
    save_bucketed(changed, "nsb_after", ["k"], buckets=8, null_safe=True)

    d = diff(spark.table("nsb_before"), spark.table("nsb_after"), ["k"])
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, (
        f"null-safe bucketed diff still shuffles:\n{plan[:3000]}"
    )
    assert "Bucketed: true" in plan
    # bucket-key metadata columns never leak into the diff contract
    assert [c for c in d.columns if "nsb" in c.lower() or "nsn" in c.lower()] == []

    # bit-identical to the unbucketed null-safe diff on the same data
    ref = diff(base, changed, ["k"])
    assert ref.columns == d.columns
    nk = lambda t: tuple((x is None, x) for x in t)  # noqa: E731
    got = sorted((tuple(r) for r in d.collect()), key=nk)
    want = sorted((tuple(r) for r in ref.collect()), key=nk)
    assert got == want
