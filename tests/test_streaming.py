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
