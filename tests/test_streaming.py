"""Structured Streaming operators: bounded-stream drains must equal their
batch equivalents (the stream/batch duality Spark guarantees for these
plans), and the stateful sessionizer must carry state across micro-batches.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark import streaming as ST
from checkatron_spark.sources.tables import load_table

REQUIRES_TESTDATA = True  # auto-skip without driver fixtures (conftest)

SF_DIR = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark):
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in ST.q_stream_windowed(spark, SF_DIR).collect()
    }
    ev = load_table(spark, "events", SF_DIR)
    expect = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (
                F.sum(
                    F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
                    .cast("bigint")
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("sum_value"),
        )
        .collect()
    }
    assert got == expect


def test_stateful_sessionize_matches_batch(spark):
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in ST.q_stream_sessionize(spark, SF_DIR).collect()
    }
    from checkatron_spark.pipelines import q_events_sessionize

    expect = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in q_events_sessionize(spark, SF_DIR).collect()
    }
    assert got == expect


def test_state_carries_across_batches(spark, tmp_path):
    """Two files arriving as separate micro-batches: the sessionizer's state
    must bridge them (events 20 min apart across the batch boundary belong
    to ONE session)."""
    d = tmp_path / "stream_src"
    d.mkdir()
    rows1 = [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00")]
    rows2 = [(1, "2024-01-01 10:30:00"), (1, "2024-01-01 12:00:00")]
    for i, rows in enumerate((rows1, rows2)):
        spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
            "user_id", F.to_timestamp("ts_str").alias("ts")
        ).coalesce(1).write.mode("overwrite").parquet(str(d / f"part{i}"))

    schema = spark.read.parquet(str(d / "part0")).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "part*"))
    )
    out = ST.drain_to_batch(ST.sessionize_stateful(sdf), output_mode="update")
    # update-mode memory sink APPENDS one emission per batch; the final state
    # is the emission with the highest (monotone) n_events
    emissions = sorted(
        (r.n_events, r.n_sessions) for r in out.collect() if r.user_id == 1
    )
    assert len(emissions) == 2  # one per micro-batch => state crossed batches
    # 10:00/10:10/10:30 chain into one session (gaps <= 30 min); 12:00 starts
    # a second — only correct if state survived the batch boundary
    assert emissions[-1] == (4, 2)


def test_drain_is_deterministic(spark):
    a = ST.q_stream_windowed(spark, SF_DIR)
    b = ST.q_stream_windowed(spark, SF_DIR)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_cms_state_survives_checkpoint_restart(spark, tmp_path):
    """VERDICT r6 item 3 (CMS half): kill the token-CMS stream between
    feeds and restart it from the same checkpoint — the complete-mode
    aggregation state (the depth x width counters) must carry across the
    restart, so the final sketch equals the batch-built sketch over ALL
    documents, not just the post-restart ones."""
    import uuid

    from checkatron_spark.corpus import _cms_cell

    docs = load_table(spark, "documents", SF_DIR).select("doc_id", "text")
    feed = str(tmp_path / "feed")
    half1 = docs.filter(F.col("doc_id") % 2 == 0)
    half2 = docs.filter(F.col("doc_id") % 2 == 1)
    half1.coalesce(1).write.mode("append").parquet(feed)

    width = 1024

    def _sketch(df):
        toks = df.select(
            F.explode(
                F.split(F.coalesce(F.col("text"), F.lit("")), " ")
            ).alias("tok")
        )
        parts = None
        for d in range(4):
            p = toks.select(
                F.lit(d).alias("row"),
                _cms_cell(F.col("tok"), d, width).alias("cell"),
            )
            parts = p if parts is None else parts.unionAll(p)
        return parts.groupBy("row", "cell").agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt")
        )

    ckpt = str(tmp_path / "ckpt")

    def _drain():
        sdf = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        name = f"cms_resume_{uuid.uuid4().hex[:8]}"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                _sketch(sdf)
                .writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(300)
            finally:
                if q.isActive:
                    q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
        return spark.table(name)

    _drain()                      # run 1: only half1 exists, then "dies"
    half2.coalesce(1).write.mode("append").parquet(feed)
    got = {                       # run 2: same checkpoint, rest of feed
        (r.row, r.cell): r.cnt for r in _drain().collect()
    }
    want = {(r.row, r.cell): r.cnt for r in _sketch(docs).collect()}
    assert got == want and len(want) > 0


def test_sessionize_state_survives_checkpoint_restart(spark, tmp_path):
    """The applyInPandasWithState half of streaming recovery: kill the
    sessionizer between feeds and restart from the same checkpoint. Events
    20 minutes apart ACROSS THE RESTART (gap < 30 min) must land in one
    session — only possible if the custom per-user state (last_ts,
    n_sessions, n_events) was restored from the state store, not rebuilt
    empty. Complements test_cms_state_survives_checkpoint_restart (built-in
    agg state) and the LSM kill-and-resume test (sink-side log)."""
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    rows1 = [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:10:00")]
    # 10:30 continues the run-1 session iff state survived the restart;
    # 12:00 then opens a second session
    rows2 = [(1, "2024-01-01 10:30:00"), (1, "2024-01-01 12:00:00")]

    def _append(rows):
        spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
            "user_id", F.to_timestamp("ts_str").alias("ts")
        ).coalesce(1).write.mode("append").parquet(feed)

    schema = "user_id bigint, ts timestamp"

    def _emit(df, batch_id):
        # update-mode memory sinks cannot recover from a checkpoint;
        # foreachBatch -> parquet is the fault-tolerant spelling
        df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(out)

    def _drain():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                ST.sessionize_stateful(sdf)
                .writeStream.foreachBatch(_emit)
                .outputMode("update")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(300)
            finally:
                if q.isActive:
                    q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    _append(rows1)
    _drain()                      # run 1 processes rows1, then "dies"
    emissions = sorted(
        (r._bid, r.n_sessions, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    assert [e[1:] for e in emissions] == [(1, 2)]

    _append(rows2)
    _drain()                      # run 2: same checkpoint, only rows2 file
    emissions = sorted(
        (r._bid, r.n_sessions, r.n_events)
        for r in spark.read.parquet(out).collect()
    )
    # state restored -> 10:30 extends the 10:00/10:10 session: (2, 4);
    # state lost -> 10:30 opens a fresh session over 0 events: (2, 2)
    assert [e[1:] for e in emissions] == [(1, 2), (2, 4)]


def test_dedup_state_survives_checkpoint_restart(spark, tmp_path):
    """The dropDuplicates half of streaming recovery: an event id seen
    BEFORE the restart must still be suppressed when it re-arrives AFTER
    the restart — the dedup key set lives in the state store and must be
    restored from the checkpoint. Fourth recovery pin alongside the agg
    (CMS), applyInPandasWithState (sessionize), and sink-log (LSM) tests."""
    feed = str(tmp_path / "feed")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    # same ts everywhere: the 1 h watermark never evicts state mid-test
    rows1 = [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 10:00:00")]
    rows2 = [(2, "2024-01-01 10:00:00"), (3, "2024-01-01 10:00:00")]

    def _append(rows):
        spark.createDataFrame(rows, ["event_id", "ts_str"]).select(
            "event_id", F.to_timestamp("ts_str").alias("ts")
        ).coalesce(1).write.mode("append").parquet(feed)

    schema = "event_id bigint, ts timestamp"

    def _emit(df, batch_id):
        df.withColumn("_bid", F.lit(batch_id)).write.mode("append").parquet(out)

    def _drain():
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        deduped = (
            sdf.withWatermark("ts", "1 hour")
            .dropDuplicates(["event_id"])
            .select("event_id")
        )
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "4")
        try:
            q = (
                deduped.writeStream.foreachBatch(_emit)
                .outputMode("append")
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(300)
            finally:
                if q.isActive:
                    q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)

    _append(rows1)
    _drain()                      # run 1 admits 1 and 2, then "dies"
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2]

    _append(rows2)
    _drain()                      # run 2: id 2 re-arrives across the restart
    got = sorted(r.event_id for r in spark.read.parquet(out).collect())
    # state restored -> 2 suppressed, only 3 new; state lost -> [1, 2, 2, 3]
    assert got == [1, 2, 3]


def test_stream_ivm_join_matches_batch_recompute(spark):
    """Streaming join-view maintenance: the drained LSM store equals the
    batch-recomputed after⋈dim join, including every fk conversion path —
    re-point onto a dim hole (row leaves the view), dim hit (row upserts),
    and plain delete."""
    from checkatron_spark import workloads as W
    from checkatron_spark.sources.tables import load_table
    from checkatron_spark.streaming import q_stream_ivm_join

    sf = "/root/testdata/sf0.001"
    got = sorted(map(tuple, q_stream_ivm_join(spark, sf).collect()))

    f_a = W.orders_after(spark, sf).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 37 == 1, F.col("o_custkey") + 1)
        .otherwise(F.col("o_custkey"))
        .alias("o_custkey"),
        "o_totalprice",
    )
    dim = (
        load_table(spark, "customer", sf)
        .filter(F.col("c_custkey") % 41 != 3)
        .select(
            F.col("c_custkey").alias("o_custkey"), "c_name", "c_acctbal"
        )
    )
    want = sorted(
        map(
            tuple,
            f_a.join(dim, "o_custkey")
            .select(
                "o_orderkey", "o_custkey", "o_totalprice",
                "c_name", "c_acctbal",
            )
            .collect(),
        )
    )
    assert got == want
    # the dim holes are real and really drop rows: every order whose
    # after-image fk points at a % 41 == 3 customer must be absent from the
    # maintained view (rows are (o_orderkey, o_custkey, ...))
    hole_orders = [
        r.o_orderkey
        for r in f_a.filter((F.col("o_custkey") % 41) == 3).collect()
    ]
    assert hole_orders
    kept_orderkeys = {r[0] for r in got}
    assert not (set(hole_orders) & kept_orderkeys)
    assert len(got) < f_a.count()


def test_drain_to_batch_timeout_raises_and_restores_conf(spark):
    """VERDICT r9 #4: round 9 made every drain raise TimeoutError instead
    of returning a silently truncated result — this exercises the raise
    (an impossible 1 ms budget), pinning the guard against regressing to
    silent truncation, and checks the shuffle-partitions pin is restored
    on the error path."""
    import pytest

    sdf = ST.read_events_stream(spark, SF_DIR)
    agg = sdf.groupBy("event_type").count()
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    with pytest.raises(TimeoutError, match="did not finish"):
        ST.drain_to_batch(agg, timeout_s=0.001)
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_apply_delta_stream_timeout_raises_then_resumes(spark, tmp_path):
    """VERDICT r9 #4: a timed-out LSM drain must raise (never hand back a
    partial snapshot), and — per the error message's contract — a re-run
    on the same state_dir must resume to the exact single-run result, so
    the timeout path leaves no corrupt state behind."""
    import pytest

    from checkatron_spark.operators.patch import apply_delta

    base = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    rows = [("U", 4, 44), ("D", 9, None), ("I", 901, 5)]
    schema = "_op string, k bigint, v bigint"
    feed = str(tmp_path / "feed")
    for row in rows:
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    def _sdf():
        return (
            spark.readStream.schema(spark.read.parquet(feed).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )

    state = str(tmp_path / "state")
    with pytest.raises(TimeoutError, match="re-run with the same state_dir"):
        ST.apply_delta_stream(
            _sdf(), base, ["k"], ["v"], state_dir=state, n_buckets=8,
            timeout_s=0.001,
        )
    snap = ST.apply_delta_stream(
        _sdf(), base, ["k"], ["v"], state_dir=state, n_buckets=8
    )
    want = apply_delta(
        base, spark.createDataFrame(rows, schema), ["k"], ["v"]
    )
    assert sorted(map(tuple, snap.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_maintain_view_stream_timeout_raises_then_resumes(spark, tmp_path):
    """VERDICT r9 #4: same contract for the additive view store — raise on
    timeout, resume-to-exact on re-run (the marker protocol keeps folds
    and checkpoint commits consistent through the interruption)."""
    import pytest

    from checkatron_spark.operators.ivm import sum_view

    base = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 10) for i in range(30)],
        "k bigint, grp string, v bigint",
    )
    rows = [("U", 1, "g1", 999, "g1", 10), ("I", 100, "g1", 5, None, None)]
    schema = ("_op string, k bigint, grp string, v bigint, "
              "_b_grp string, _b_v bigint")
    feed = str(tmp_path / "feed")
    for row in rows:
        spark.createDataFrame([row], schema).coalesce(1).write.mode(
            "append"
        ).parquet(feed)

    def _sdf():
        return (
            spark.readStream.schema(spark.read.parquet(feed).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )

    state = str(tmp_path / "state")
    init = sum_view(base, ["grp"], ["v"])
    with pytest.raises(TimeoutError, match="re-run with the same state_dir"):
        ST.maintain_view_stream(
            _sdf(), init, ["grp"], ["v"], state_dir=state, timeout_s=0.001
        )
    got = ST.maintain_view_stream(
        _sdf(), init, ["grp"], ["v"], state_dir=state
    )
    after = spark.createDataFrame(
        [(i, "g%d" % (i % 3), i * 10) for i in range(30) if i != 1]
        + [(1, "g1", 999), (100, "g1", 5)],
        "k bigint, grp string, v bigint",
    )
    exp = sum_view(after, ["grp"], ["v"])
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, exp.collect())
    )


def test_stream_ann_admission_equals_batch_build(spark):
    """Round 14 stretch (VERDICT r13 #7): the micro-batched admission
    stream's drained search must be ROW-IDENTICAL to the batch
    ivf_grid_topk at the same parameters — streaming admission == batch
    index build, the drained-state == batch-result contract."""
    from pyspark.sql import functions as F

    from checkatron_spark.operators.pq import ivf_grid_topk
    from checkatron_spark.sources.tables import load_table
    from checkatron_spark.streaming import q_stream_ann_ivf_admission

    sf = "/root/testdata/sf0.001"
    streamed = sorted(map(tuple, q_stream_ann_ivf_admission(
        spark, sf
    ).collect()))
    emb = load_table(spark, "embeddings", sf)
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    batch = sorted(map(tuple, ivf_grid_topk(
        emb, queries, n_cells=8, n_probe=2, iters=2, scale=10000,
        topk=3, fit_sample=256,
    ).collect()))
    assert streamed == batch and len(streamed) > 0
