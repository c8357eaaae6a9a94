"""Incremental view maintenance: maintained count/sum view equals the view
recomputed over the new snapshot — including cross-group updates, groups
dropping to zero, new groups, and NULL value retraction."""

from __future__ import annotations

from checkatron_spark.operators.ivm import maintain_sum_view, sum_view
from checkatron_spark.operators.patch import compact_delta

KEYS = ["k"]
VALS = ["grp", "v"]


def _before(spark):
    rows = [
        (1, "a", 10),
        (2, "a", 20),
        (3, "b", 30),
        (4, "b", None),   # NULL value: contributes 0 to the sum
        (5, "c", 50),     # group c will vanish entirely
    ]
    return spark.createDataFrame(rows, "k int, grp string, v int")


def _after(spark):
    rows = [
        (1, "a", 10),     # unchanged
        (2, "b", 20),     # moves a -> b (retract from a, add to b)
        (3, "b", 35),     # value change within b
        (4, "b", 40),     # NULL -> value
        (6, "d", 60),     # brand-new group d
    ]                      # key 5 deleted -> group c must disappear
    return spark.createDataFrame(rows, "k int, grp string, v int")


def _maintained(spark):
    b, a = _before(spark), _after(spark)
    view = sum_view(b, ["grp"], ["v"])
    delta = compact_delta(b, a, KEYS, VALS, include_before=True)
    return maintain_sum_view(view, delta, ["grp"], ["v"])


def test_maintained_equals_recomputed(spark):
    got = {
        r["grp"]: (r["n_rows"], r["sum_v"]) for r in _maintained(spark).collect()
    }
    recomputed = {
        r["grp"]: (r["n_rows"], r["sum_v"])
        for r in sum_view(_after(spark), ["grp"], ["v"]).collect()
    }
    assert got == recomputed == {
        "a": (1, 10),
        "b": (3, 95),
        "d": (1, 60),
    }


def test_vanished_group_is_dropped(spark):
    assert "c" not in {r["grp"] for r in _maintained(spark).collect()}


def test_empty_delta_is_identity(spark):
    b = _before(spark)
    view = sum_view(b, ["grp"], ["v"])
    delta = compact_delta(b, b, KEYS, VALS, include_before=True)
    kept = maintain_sum_view(view, delta, ["grp"], ["v"])
    assert sorted(map(tuple, kept.collect())) == sorted(
        map(tuple, view.collect())
    )


def test_include_before_images(spark):
    delta = compact_delta(
        _before(spark), _after(spark), KEYS, VALS, include_before=True
    )
    rows = {r["k"]: r for r in delta.collect()}
    assert rows[2]["_op"] == "U" and rows[2]["_b_grp"] == "a"
    assert rows[6]["_op"] == "I" and rows[6]["_b_grp"] is None
    assert rows[5]["_op"] == "D" and rows[5]["_b_v"] == 50


def _minmax_fixture(spark):
    before = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 50),   # a's max
            (3, "a", 30),
            (4, "b", 5),    # b's min AND part of b
            (5, "b", 9),
        ],
        "k int, grp string, v int",
    )
    after = spark.createDataFrame(
        [
            (1, "a", 10),
            (3, "a", 30),   # key 2 deleted: a's max retracted -> dirty rescan
            (4, "b", 7),    # b's min updated upward -> dirty rescan
            (5, "b", 9),
            (6, "b", 100),  # insert extends b's max (clean would suffice)
            (7, "c", 1),    # new group
        ],
        "k int, grp string, v int",
    )
    return before, after


def test_minmax_maintained_equals_recomputed(spark):
    from checkatron_spark.operators.ivm import maintain_minmax_view, minmax_view

    before, after = _minmax_fixture(spark)
    view = minmax_view(before, ["grp"], "v")
    delta = compact_delta(before, after, ["k"], ["grp", "v"], include_before=True)
    got = maintain_minmax_view(view, delta, after, ["grp"], "v")
    exp = minmax_view(after, ["grp"], "v")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, exp.collect()))


def test_minmax_clean_only_changes(spark):
    """Inserts that only extend extremes never trigger a rescan path —
    result still matches recompute."""
    from checkatron_spark.operators.ivm import maintain_minmax_view, minmax_view

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20)], "k int, grp string, v int"
    )
    after = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "a", 99), (4, "a", -5)],
        "k int, grp string, v int",
    )
    view = minmax_view(before, ["grp"], "v")
    delta = compact_delta(before, after, ["k"], ["grp", "v"], include_before=True)
    got = maintain_minmax_view(view, delta, after, ["grp"], "v")
    assert [tuple(r) for r in got.collect()] == [("a", 4, -5, 99)]


def test_minmax_group_vanishes(spark):
    from checkatron_spark.operators.ivm import maintain_minmax_view, minmax_view

    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, grp string, v int"
    )
    after = spark.createDataFrame([(1, "a", 10)], "k int, grp string, v int")
    view = minmax_view(before, ["grp"], "v")
    delta = compact_delta(before, after, ["k"], ["grp", "v"], include_before=True)
    got = maintain_minmax_view(view, delta, after, ["grp"], "v")
    assert [tuple(r) for r in got.collect()] == [("a", 1, 10, 10)]


def test_streaming_view_maintenance_matches_recompute(spark):
    """maintain_view_stream over a multi-batch feed converges to the view
    recomputed over the after snapshot (sf0.001)."""
    import os
    import shutil
    import tempfile

    import pytest

    if not os.path.isdir("/root/testdata/sf0.001"):
        pytest.skip("driver parquet fixtures not available")
    import pyspark.sql.functions as F

    from checkatron_spark import workloads as W
    from checkatron_spark.streaming import maintain_view_stream

    sf = "/root/testdata/sf0.001"
    cents = F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast(
        "bigint"
    )

    def frame(df):
        return df.select("o_orderkey", "o_orderpriority", cents.alias("price_c"))

    b = frame(W.orders_before(spark, sf))
    a = frame(W.orders_after(spark, sf))
    delta = compact_delta(
        b, a, ["o_orderkey"], ["o_orderpriority", "price_c"],
        include_before=True,
    )
    work = tempfile.mkdtemp(prefix="test_stream_ivm_")
    try:
        delta.repartition(3).write.mode("overwrite").parquet(f"{work}/feed")
        sdf = (
            spark.readStream.schema(delta.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{work}/feed")
        )
        got = maintain_view_stream(
            sdf,
            sum_view(b, ["o_orderpriority"], ["price_c"]),
            ["o_orderpriority"],
            ["price_c"],
            state_dir=f"{work}/state",
        )
        exp = sum_view(a, ["o_orderpriority"], ["price_c"])
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, exp.collect())
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ---------------------------------------------------------------------------
# join-view maintenance: maintained fact⋈dim view equals the join recomputed
# over the new snapshots — fk moves, dangling facts, dim inserts resolving
# danglers, deletes cascading, and churn on both sides at once
# ---------------------------------------------------------------------------

def _join_fixture(spark, fact_rows, dim_rows):
    fact = spark.createDataFrame(fact_rows, "fid int, dk int, fv int")
    dim = spark.createDataFrame(dim_rows, "dk int, dv string")
    return fact, dim


def _maintain(spark, f_b, f_a, d_b, d_a):
    from checkatron_spark.operators.ivm import join_view, maintain_join_view

    view = join_view(f_b, d_b, "dk")
    delta_f = compact_delta(f_b, f_a, ["fid"], ["dk", "fv"])
    delta_d = compact_delta(d_b, d_a, ["dk"], ["dv"])
    got = maintain_join_view(
        view, delta_f, delta_d, f_a, d_a, ["fid"], "dk"
    )
    want = join_view(f_a, d_a, "dk")
    assert got.columns == want.columns
    return (
        sorted(map(tuple, got.collect())),
        sorted(map(tuple, want.collect())),
    )


def test_join_view_fact_churn_only(spark):
    f_b, d = _join_fixture(
        spark,
        [(1, 10, 100), (2, 20, 200), (3, 10, 300)],
        [(10, "a"), (20, "b"), (30, "c")],
    )
    # insert fid 4 (matching), update fid 1's value, re-point fid 3's fk to
    # a different dim, delete fid 2
    f_a = spark.createDataFrame(
        [(1, 10, 101), (3, 30, 300), (4, 20, 400)], "fid int, dk int, fv int"
    )
    got, want = _maintain(spark, f_b, f_a, d, d)
    assert got == want


def test_join_view_dim_insert_resolves_dangling_fact(spark):
    # fid 2 points at dk 99 which does not exist BEFORE (dangling, not in
    # the view); the dim insert of 99 must surface it — the case that
    # forces probing the fact table, not the view
    f, d_b = _join_fixture(
        spark,
        [(1, 10, 100), (2, 99, 200)],
        [(10, "a")],
    )
    d_a = spark.createDataFrame(
        [(10, "a"), (99, "new")], "dk int, dv string"
    )
    got, want = _maintain(spark, f, f, d_b, d_a)
    assert got == want
    # join col is first in join_view's output: rows are (dk, fid, fv, dv)
    assert any(r[1] == 2 for r in got)  # the dangler is now matched


def test_join_view_dim_delete_cascades(spark):
    f, d_b = _join_fixture(
        spark,
        [(1, 10, 100), (2, 20, 200)],
        [(10, "a"), (20, "b")],
    )
    d_a = spark.createDataFrame([(10, "a")], "dk int, dv string")
    got, want = _maintain(spark, f, f, d_b, d_a)
    assert got == want
    assert not any(r[0] == 20 for r in got)  # rows are (dk, fid, fv, dv)


def test_join_view_dim_update_rewrites_matches(spark):
    # one dim attribute changes; every fact pointing at it must carry the
    # new image, facts pointing elsewhere must be byte-identical
    f, d_b = _join_fixture(
        spark,
        [(1, 10, 100), (2, 10, 200), (3, 20, 300)],
        [(10, "old"), (20, "keep")],
    )
    d_a = spark.createDataFrame(
        [(10, "NEW"), (20, "keep")], "dk int, dv string"
    )
    got, want = _maintain(spark, f, f, d_b, d_a)
    assert got == want
    assert sum(1 for r in got if r[3] == "NEW") == 2


def test_join_view_null_fk_stays_dropped(spark):
    # NULL fk facts never join (inner semantics) — before, after, and
    # through churn on the same rows
    f_b = spark.createDataFrame(
        [(1, None, 100), (2, 10, 200)], "fid int, dk int, fv int"
    )
    f_a = spark.createDataFrame(
        [(1, 10, 100), (2, None, 200)], "fid int, dk int, fv int"
    )
    d = spark.createDataFrame([(10, "a")], "dk int, dv string")
    got, want = _maintain(spark, f_b, f_a, d, d)
    assert got == want
    assert [r[1] for r in got] == [1]  # rows are (dk, fid, fv, dv)


def test_join_view_property_random_churn_both_sides(spark):
    """Randomized upserts on both sides simultaneously: maintained ==
    recomputed for every seed (deterministic arithmetic churn)."""
    for seed in (1, 2, 3):
        fact_b = [
            (i, (i * 3 + seed) % 8, i * 10) for i in range(30)
        ]
        dim_b = [(k, f"v{k}") for k in range(0, 8, 1) if k % 3 != seed % 3]
        fact_a = [
            (i, (i * 5 + seed) % 10, i * 10 + (i % 4))
            for i in range(2, 34)  # drops fids 0-1, inserts 30-33
        ]
        dim_a = [
            (k, f"v{k}{'x' if k % 2 == 0 else ''}")
            for k in range(0, 10)
            if k % 4 != seed % 4
        ]
        f_b, d_b = _join_fixture(spark, fact_b, dim_b)
        f_a, d_a = _join_fixture(spark, fact_a, dim_a)
        got, want = _maintain(spark, f_b, f_a, d_b, d_a)
        assert got == want, f"seed {seed}"


def test_join_view_sequential_equals_composed_deltas(spark):
    """Algebra chain: maintaining through (d1 then d2) equals maintaining
    once with compose_deltas(d1, d2) on both sides — the law that lets a
    day of hourly changefeeds be folded into the view as ONE compacted
    application."""
    from checkatron_spark.operators.ivm import join_view, maintain_join_view
    from checkatron_spark.operators.patch import compose_deltas

    def fact(rows):
        return spark.createDataFrame(rows, "fid int, dk int, fv int")

    def dim(rows):
        return spark.createDataFrame(rows, "dk int, dv string")

    f0 = fact([(1, 10, 100), (2, 20, 200), (3, 10, 300)])
    f1 = fact([(1, 20, 101), (3, 10, 300), (4, 30, 400)])  # move, del, ins
    f2 = fact([(1, 20, 102), (4, 10, 400), (5, 99, 500)])  # upd, move, dangle
    d0 = dim([(10, "a"), (20, "b")])
    d1 = dim([(10, "a2"), (20, "b"), (30, "c")])  # upd, ins
    d2 = dim([(10, "a2"), (30, "c2")])  # del 20, upd 30

    df1 = compact_delta(f0, f1, ["fid"], ["dk", "fv"])
    df2 = compact_delta(f1, f2, ["fid"], ["dk", "fv"])
    dd1 = compact_delta(d0, d1, ["dk"], ["dv"])
    dd2 = compact_delta(d1, d2, ["dk"], ["dv"])

    v0 = join_view(f0, d0, "dk")
    step = maintain_join_view(v0, df1, dd1, f1, d1, ["fid"], "dk")
    sequential = maintain_join_view(step, df2, dd2, f2, d2, ["fid"], "dk")

    one_shot = maintain_join_view(
        v0,
        compose_deltas(df1, df2, ["fid"], ["dk", "fv"]),
        compose_deltas(dd1, dd2, ["dk"], ["dv"]),
        f2, d2, ["fid"], "dk",
    )
    want = sorted(map(tuple, join_view(f2, d2, "dk").collect()))
    assert sorted(map(tuple, sequential.collect())) == want
    assert sorted(map(tuple, one_shot.collect())) == want


def test_join_view_rejects_partial_delta(spark):
    """A delta missing a fact column cannot supply after-images — refused
    loudly instead of producing a wrong view."""
    import pytest

    from checkatron_spark.operators.ivm import join_view, maintain_join_view

    f = spark.createDataFrame([(1, 10, 100)], "fid int, dk int, fv int")
    d = spark.createDataFrame([(10, "a")], "dk int, dv string")
    # delta lacking fv: compact_delta over a projection
    partial = compact_delta(
        f.select("fid", "dk"), f.select("fid", "dk"), ["fid"], ["dk"]
    )
    full_d = compact_delta(d, d, ["dk"], ["dv"])
    with pytest.raises(ValueError, match="full fact row"):
        maintain_join_view(
            join_view(f, d, "dk"), partial, full_d, f, d, ["fid"], "dk"
        )


def test_streaming_view_restart_resumes_committed_folds(spark, tmp_path):
    """Review r9: maintain_view_stream used to RESET the view to
    initial_view on every call while the checkpoint skipped already-
    committed batches — a restart silently lost their adjustments. The
    marker-file recovery must make kill-and-resume equal the single-run
    view, and a replayed already-folded epoch must be skipped (additive
    folds are not idempotent)."""
    import pyspark.sql.functions as F

    from checkatron_spark.operators.ivm import sum_view
    from checkatron_spark.streaming import maintain_view_stream

    base = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 10) for i in range(30)],
        "k bigint, grp string, v bigint",
    )
    # before-image changefeed rows (maintain_sum_view contract: after
    # image in (grp, v), before image in (_b_grp, _b_v))
    phase1 = [("U", 1, "g1", 999, "g1", 10), ("I", 100, "g1", 5, None, None)]
    phase2 = [("D", 2, None, None, "g2", 20), ("U", 4, "g1", 77, "g1", 40)]
    schema = ("_op string, k bigint, grp string, v bigint, "
              "_b_grp string, _b_v bigint")
    feed = str(tmp_path / "feed")
    for row in phase1:
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    def _sdf():
        return (
            spark.readStream.schema(
                spark.read.parquet(feed).schema
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )

    state = str(tmp_path / "state")
    init = sum_view(base, ["grp"], ["v"])
    v1 = maintain_view_stream(
        _sdf(), init, ["grp"], ["v"], state_dir=state
    )
    v1.collect()  # drain run 1 ("dies" after committing phase1)

    for row in phase2:
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    # run 2: same state_dir -> recover the live slot + last epoch, fold
    # ONLY phase2; the result must equal the recompute over the final
    # table state
    v2 = maintain_view_stream(
        _sdf(), init, ["grp"], ["v"], state_dir=state
    )
    after = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 10) for i in range(30)
         if i not in (1, 2, 4)]
        + [(1, "g1", 999), (100, "g1", 5), (4, "g1", 77)],
        "k bigint, grp string, v bigint",
    )
    exp = sum_view(after, ["grp"], ["v"])
    assert sorted(map(tuple, v2.collect())) == sorted(
        map(tuple, exp.collect())
    )


def _view_feed_scaffold(spark, tmp_path, rows):
    """Shared scaffolding for the view-stream crash-window negatives:
    a parquet changefeed (one file per row -> one epoch per row under
    maxFilesPerTrigger=1), the initial summed view, and a stream factory."""
    from checkatron_spark.operators.ivm import sum_view

    base = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 10) for i in range(30)],
        "k bigint, grp string, v bigint",
    )
    schema = ("_op string, k bigint, grp string, v bigint, "
              "_b_grp string, _b_v bigint")
    feed = str(tmp_path / "feed")

    def _append(batch):
        for row in batch:
            spark.createDataFrame([row], schema).coalesce(1).write.mode(
                "append"
            ).parquet(feed)

    _append(rows)

    def _sdf():
        return (
            spark.readStream.schema(spark.read.parquet(feed).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )

    return base, sum_view(base, ["grp"], ["v"]), feed, _append, _sdf


def test_view_stream_legacy_checkpoint_without_marker_refuses(
    spark, tmp_path
):
    """ADVICE r9 (medium): a state_dir with a surviving _checkpoint but NO
    view_version.json marker (pre-marker-protocol layout, or a partial
    wipe) must FAIL FAST — re-initializing to v0 while the checkpoint
    skips committed batches silently loses their adjustments, the exact
    bug the marker protocol fixed."""
    import os

    import pytest

    from checkatron_spark.streaming import maintain_view_stream

    _, init, _, _, _sdf = _view_feed_scaffold(
        spark, tmp_path, [("U", 1, "g1", 999, "g1", 10)]
    )
    state = str(tmp_path / "state")
    maintain_view_stream(_sdf(), init, ["grp"], ["v"], state_dir=state)
    os.remove(os.path.join(state, "view_version.json"))  # the partial wipe
    with pytest.raises(RuntimeError, match="fresh state_dir"):
        maintain_view_stream(_sdf(), init, ["grp"], ["v"], state_dir=state)
    # refusal must not have "repaired" anything: the marker stays absent
    assert not os.path.exists(os.path.join(state, "view_version.json"))


def test_view_stream_ignores_torn_marker_tmp(spark, tmp_path):
    """Crash window (VERDICT r9 #8, mirroring the LSM trio): the process
    died inside _save_marker — view_version.json.tmp is half-written while
    the committed marker survives (os.replace is atomic). Recovery must
    read the committed marker, ignore + remove the torn tmp, and the
    resumed view must equal the recompute over the final table state."""
    import os

    from checkatron_spark.operators.ivm import sum_view
    from checkatron_spark.streaming import maintain_view_stream

    phase1 = [("U", 1, "g1", 999, "g1", 10), ("I", 100, "g1", 5, None, None)]
    phase2 = [("D", 2, None, None, "g2", 20), ("U", 4, "g1", 77, "g1", 40)]
    base, init, _, _append, _sdf = _view_feed_scaffold(
        spark, tmp_path, phase1
    )
    state = str(tmp_path / "state")
    maintain_view_stream(_sdf(), init, ["grp"], ["v"], state_dir=state)
    tmp = os.path.join(state, "view_version.json.tmp")
    with open(tmp, "w") as fh:
        fh.write('{"ver": 1, "last_ep')  # truncated mid-JSON
    _append(phase2)
    v = maintain_view_stream(_sdf(), init, ["grp"], ["v"], state_dir=state)
    after = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 10) for i in range(30)
         if i not in (1, 2, 4)]
        + [(1, "g1", 999), (100, "g1", 5), (4, "g1", 77)],
        "k bigint, grp string, v bigint",
    )
    exp = sum_view(after, ["grp"], ["v"])
    assert sorted(map(tuple, v.collect())) == sorted(
        map(tuple, exp.collect())
    )
    assert not os.path.exists(tmp)  # torn artifact cleaned, not read


def test_view_stream_replayed_committed_epoch_is_skipped(spark, tmp_path):
    """Crash window (VERDICT r9 #8): the process died BETWEEN the fold
    commit (marker saved) and the checkpoint commit — on restart the
    checkpoint redelivers that epoch under the SAME epoch id. Additive
    folds are not idempotent, so the fold must be SKIPPED (epoch_id <=
    last_epoch), leaving the view equal to the single-run result."""
    import os

    from checkatron_spark.streaming import maintain_view_stream

    phase1 = [("U", 1, "g1", 999, "g1", 10), ("I", 100, "g1", 5, None, None)]
    _, init, _, _, _sdf = _view_feed_scaffold(spark, tmp_path, phase1)
    state = str(tmp_path / "state")
    v1 = maintain_view_stream(_sdf(), init, ["grp"], ["v"], state_dir=state)
    want = sorted(map(tuple, v1.collect()))
    # fabricate the crash window: the last epoch's checkpoint commit is
    # lost while the marker (fold already committed) survives
    commits = sorted(
        os.listdir(os.path.join(state, "_checkpoint", "commits"))
    )
    last = [c for c in commits if not c.startswith(".")][-1]
    os.remove(os.path.join(state, "_checkpoint", "commits", last))
    crc = os.path.join(state, "_checkpoint", "commits", f".{last}.crc")
    if os.path.exists(crc):  # local-fs checksum sidecar must go with it
        os.remove(crc)
    v2 = maintain_view_stream(_sdf(), init, ["grp"], ["v"], state_dir=state)
    assert sorted(map(tuple, v2.collect())) == want
