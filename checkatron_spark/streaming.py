"""Structured Streaming operators over the events table.

The reference has no streaming surface (SURVEY.md §2.9); this module covers
the stream-shaped extension mandate with idiomatic Structured Streaming:

- file-source ``readStream`` over the parquet fixtures (schema declared up
  front — streaming sources never infer),
- event-time tumbling-window aggregation with a watermark bounding state,
- a custom stateful operator via ``applyInPandasWithState`` (incremental
  per-user sessionization — the shape Spark's built-ins can't express),
- ``Trigger.AvailableNow`` + memory sink to drain a bounded stream to a batch
  DataFrame, which is how the driver contract oracle-checks streaming results
  against DuckDB running the equivalent batch SQL.

At scale: the same plans run unmodified against a Kafka/file-stream source on
a cluster — watermark state is bounded per window x key, the sessionizer's
state is one row per live user, and both shuffle only on their group keys.
Checkpointing is a sink option away (not set for the in-memory test drains).
"""

from __future__ import annotations

import uuid
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

from checkatron_spark.session import scratch_tempdir

__all__ = [
    "read_events_stream",
    "windowed_event_counts",
    "sessionize_stateful",
    "drain_to_batch",
    "apply_delta_stream",
    "maintain_view_stream",
]

_SESSION_GAP_SECONDS = 30 * 60

# changefeed parquet written once per (Spark app, sf_dir) and replayed by
# every subsequent stream run — in production the feed EXISTS (upstream CDC
# produces it); computing the compact delta is not part of the replay path.
# Deterministic content (fixed inputs, fixed delta), so reuse is exact.
# Same lifecycle precedent as pipelines._IVF_QUANTIZERS.
_FEED_CACHE: dict[tuple[str, str, str], str] = {}


def _cached_feed(spark: SparkSession, key: str, sf_dir: str, delta) -> str:
    """Write ``delta`` as a 4-file changefeed once per (app, key, sf_dir);
    later calls replay the existing parquet."""
    import os

    cache_key = (spark.sparkContext.applicationId, key, sf_dir)
    feed = _FEED_CACHE.get(cache_key)
    if feed is not None and not os.path.isdir(feed):
        # /tmp may be reaped under a long-lived app — re-write, don't hand
        # the stream a vanished path
        feed = None
    if feed is None:
        work = scratch_tempdir(f"stream_{key}_")
        feed = f"{work}/feed"
        delta.repartition(4).write.mode("overwrite").parquet(feed)
        _FEED_CACHE[cache_key] = feed
    return feed


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the events fixture. Schema comes from a
    driver-side batch peek (streaming sources require a declared schema);
    ``ts`` is normalized to session-zone ``TimestampType`` exactly like the
    batch loader (sources/tables.py): bigint nanos (TIMESTAMP(NANOS) under
    nanosAsLong) via timestamp_micros, TIMESTAMP_NTZ (timestamp[us] with no
    UTC flag) via a cast — watermarks reject TIMESTAMP_NTZ event time."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    ts_type = dict(sdf.dtypes).get("ts")
    if ts_type == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
    return sdf


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time tumbling-window counts with a watermark. The watermark
    bounds state (windows older than max(ts) - watermark are finalized and
    dropped); late rows beyond it are discarded — the standard late-data
    policy for unbounded streams."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # micros-integer sum: exact + order-independent (pipelines.py)
            (
                F.sum(
                    F.floor(F.col("value") * F.lit(1000000.0) + F.lit(0.5))
                    .cast("bigint")
                ).cast("double")
                / F.lit(1000000.0)
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_SESSION_OUTPUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)
# state = (last event timestamp micros, sessions so far, events so far)
_SESSION_STATE = StructType(
    [
        StructField("last_ts", LongType()),
        StructField("n_sessions", LongType()),
        StructField("n_events", LongType()),
    ]
)


def _sessionize_fn(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Incremental sessionization: a new session starts after a >30 min gap.
    State carries (last_ts, n_sessions, n_events) per user — O(1) per key,
    so total state is one tiny row per live user regardless of stream
    length."""
    last_ts, n_sessions, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    chunks = [pdf["ts"] for pdf in pdfs]
    if chunks:
        # NULL timestamps would become NaT -> -2^63 in the int64 cast and
        # poison last_ts for every later event (review r9) — drop them;
        # cross-BATCH ordering is the feed's contract (within a batch we
        # sort; an out-of-order batch boundary can merge two sessions,
        # the standard limitation of gap sessionization over an unordered
        # feed — use the batch sessionizer for retrospective corrections)
        ts = pd.concat(chunks).dropna().sort_values()
        # unit-safe conversion: datetime64[any] -> ns int -> micros
        micros = (ts.astype("datetime64[ns]").astype("int64") // 1000).to_numpy()
        for t in micros:
            if last_ts is None or t - last_ts > _SESSION_GAP_SECONDS * 1_000_000:
                n_sessions += 1
            last_ts = int(t)
            n_events += 1
    state.update((last_ts, n_sessions, n_events))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def sessionize_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState): running
    per-user session/event counts, updated per micro-batch."""
    return events.select("user_id", "ts").groupBy("user_id").applyInPandasWithState(
        _sessionize_fn,
        outputStructType=_SESSION_OUTPUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def drain_to_batch(
    sdf: DataFrame,
    *,
    output_mode: str = "complete",
    timeout_s: int = 300,
    state_partitions: int | None = 4,
) -> DataFrame:
    """Run a bounded stream to completion (Trigger.AvailableNow) into a
    memory sink and return the resulting batch DataFrame. For 'update' mode
    the sink holds the latest emission per key (single-batch drains emit
    final values).

    ``state_partitions`` pins ``spark.sql.shuffle.partitions`` while the
    query STARTS (streaming state partitioning is frozen at start and every
    partition pays a per-batch state-store commit, even empty ones — a
    32-partition stream-stream join spends ~10s/batch on store maintenance
    alone at local scale). Size it to state-key cardinality: the fixtures
    have 150 users, so 4 is generous; a cluster job with millions of keys
    would pass thousands. The session conf is restored after start, so batch
    queries keep their width."""
    name = f"drain_{uuid.uuid4().hex[:12]}"
    spark = sdf.sparkSession
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    # NOTE: restore only after termination — start() returns before the
    # stream thread plans batch 0, which is when the conf is actually read.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = writer.start()
        try:
            done = q.awaitTermination(timeout_s)
        finally:
            if q.isActive:
                q.stop()
        if not done:
            # a timed-out drain has folded only SOME batches — returning
            # the memory table would hand back a silently truncated result
            # that grades as an operator bug downstream (review r9)
            raise TimeoutError(
                f"drain_to_batch: stream did not finish within {timeout_s}s"
            )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.table(name)


def stream_diff(
    stream: DataFrame,
    baseline: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Streaming diff: score every incoming row against a static baseline
    snapshot — the reference's per-column status semantics
    (/root/reference/checkatron/templates/full_compare.sql.j2:77-85) in
    continuous form.

    Stream-static left join (Spark broadcasts/rescans the static side per
    micro-batch; no state is kept, so this runs forever at constant
    memory). Per shared column: 0 match (incl. both NULL), 1 different,
    2 NULL-in-stream-only, 3 NULL-in-baseline-only; ``_row_status`` = 4
    when the key is absent from the baseline (a "new" row, mirroring
    missing-in-before). Missing-in-stream (5) is undefined while the
    stream is unbounded — absence isn't observable until a watermark
    closes, which is the windowed-agg operators' job."""
    b = baseline.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"_bv_{c}") for c in compare_cols],
        F.lit(True).alias("_b_present"),
    )
    cond = None
    for k in keys:
        c = stream[k].eqNullSafe(b[f"_bk_{k}"])
        cond = c if cond is None else cond & c
    joined = stream.join(b, cond, "left")
    status_cols = []
    for c in compare_cols:
        s, bl = F.col(c), F.col(f"_bv_{c}")
        status_cols.append(
            F.when(bl.isNull() & s.isNull(), F.lit(0))
            .when(bl.isNull() & s.isNotNull(), F.lit(2))
            .when(bl.isNotNull() & s.isNull(), F.lit(3))
            .when(bl == s, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias(f"status_{c}")
        )
    row_status = (
        F.when(F.col("_b_present").isNull(), F.lit(4))
        .otherwise(F.lit(None))
        .cast("int")
        .alias("_row_status")
    )
    return joined.select(*keys, row_status, *status_cols)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    left_ts: str,
    right_ts: str,
    watermark: str = "1 hour",
    max_gap: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream inner join: pair each right-stream row with
    the left-stream rows of the same key that precede it by at most
    ``max_gap``. Both sides carry a watermark plus the time-range join
    condition, so Spark can bound the buffered state on each side (rows older
    than watermark + gap are evicted) — the canonical unbounded-join pattern.
    The key column must already be distinctly named on each side."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = F.expr(
        f"{key}_l = {key}_r AND {right_ts} >= {left_ts} "
        f"AND {right_ts} <= {left_ts} + INTERVAL {max_gap}"
    )
    return lw.join(rw, cond, "inner")


def apply_delta_stream(
    delta_stream: DataFrame,
    base: DataFrame,
    keys: list[str],
    value_cols: list[str],
    *,
    state_dir: str,
    n_buckets: int = 16,
    compact_every: int = 16,
    timeout_s: int = 300,
    io_log: list | None = None,
) -> DataFrame:
    """Continuously materialize a CDC changefeed onto a snapshot: the
    streaming counterpart of ``operators/patch.py::apply_delta``.

    LSM-SHAPED STORE (VERDICT r5 item 1): delta-partition log + bucketed
    copy-on-write compaction — the two-tier layout every production table
    format converges on (Delta/Iceberg MERGE-on-read + scheduled rewrite).

    - **Per micro-batch (hot path): append only.** The batch is written
      verbatim (stamped with its epoch) as one log partition. Cost ∝ that
      batch's churn, exactly — the snapshot is never listed, read, or
      rewritten; there is no per-batch join at all.
    - **Compaction (every ``compact_every`` batches, and once at drain
      end): bucket-pruned fold.** The pending log is reduced to the
      latest image per key (a key-partitioned window over log rows — state
      ∝ accumulated churn, never ∝ snapshot), the DISTINCT touched bucket
      ids are collected (bounded by ``n_buckets``), ONLY those buckets'
      current dirs are read, the ``apply_delta`` anti-join + union folds
      the net delta in (delta side broadcastable), and only those buckets
      are rewritten into a fresh epoch dir. The manifest (driver-side
      dict: bucket → live dir, bounded by ``n_buckets``) is repointed;
      fully superseded epoch dirs and consumed log partitions are reaped.

    Read amplification is bounded by ``compact_every``; write/read cost
    per compaction is ∝ touched buckets — the file-pruned cost model of a
    table-format MERGE. ``n_buckets`` tunes the granularity: clustered
    churn folds into few buckets; adversarially uniform churn degrades
    the COMPACTION (not the per-batch appends) toward a full rewrite,
    exactly as a real MERGE's touched-file set would.

    CDC contract: within one micro-batch a key occurs at most once (a
    compacted feed); across batches the latest epoch's image wins, which
    equals applying the batches sequentially.

    ``io_log`` (tests): when a list is passed, appends one record per
    delivered batch (``mode="append"``, with ``files_read=[]`` — the pin
    that the hot path reads nothing) and one per compaction
    (``mode="compact"``, with the touched bucket ids and the base files
    actually read — the pin that folds stay inside touched buckets).

    KILL/RESUME (round 7): the store is crash-recoverable from disk. The
    manifest is committed atomically (tmp + rename) after the seed and
    after every compaction; consumed logs are reaped only AFTER that
    commit. A restarted call on the same ``state_dir`` reloads the
    manifest, rebuilds ``pending`` from the surviving log partitions
    (re-folding an already-applied log is idempotent — apply_delta
    re-upserts the same images), and the streaming checkpoint skips
    already-committed batches; an uncommitted batch replays under its
    original epoch id onto its own log partition. Pinned by the
    kill-and-resume / orphan-log / refold-noop tests in test_patch.py.

    Runs the stream to completion (AvailableNow) and returns the final
    snapshot as a batch DataFrame (backed by the manifest's live dirs)."""
    import os
    import shutil

    from pyspark.sql.window import Window

    from checkatron_spark.operators.patch import apply_delta

    spark = delta_stream.sparkSession
    cols = keys + value_cols

    def _bucket(df: DataFrame):
        return F.pmod(F.xxhash64(*[df[k] for k in keys]), F.lit(n_buckets))

    def _live_buckets(epoch_dir: str) -> dict[int, str]:
        out = {}
        for d in os.listdir(epoch_dir):
            if d.startswith("_bucket="):
                out[int(d.split("=", 1)[1])] = os.path.join(epoch_dir, d)
        return out

    seeded = base.select(*cols)
    manifest_path = os.path.join(state_dir, "manifest.json")

    def _save_manifest() -> None:
        # atomic repoint (tmp + rename): a crash leaves either the old or
        # the new manifest, never a torn one — the same commit discipline
        # as a table format's metadata pointer
        import json

        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({str(k): v for k, v in manifest.items()}, fh)
        os.replace(tmp, manifest_path)

    if os.path.exists(manifest_path):
        # KILL/CRASH RECOVERY (VERDICT r6 item 3): the on-disk layout is
        # the source of truth. Reload the committed manifest; any log
        # partition still on disk is unconsumed churn (compaction deletes
        # logs only AFTER the manifest commit) and re-folding an
        # already-folded log is idempotent (apply_delta re-upserts the
        # same images). The streaming checkpoint prevents re-delivery of
        # committed batches; an UNcommitted batch replays under its
        # original epoch id and overwrites its own log partition.
        import json

        # a crash INSIDE _save_manifest leaves manifest.json.tmp torn on
        # disk while manifest.json still holds the last committed state —
        # os.replace is atomic, so the pointer is never torn. The stray
        # tmp is dead: remove it so it can't be mistaken for state by any
        # outside tooling (round 9, VERDICT r8 #4)
        try:
            os.remove(manifest_path + ".tmp")
        except FileNotFoundError:
            pass
        with open(manifest_path) as fh:
            manifest: dict[int, str] = {
                int(k): v for k, v in json.load(fh).items()
            }
        logdir = os.path.join(state_dir, "log")
        pending: list[int] = sorted(
            int(d[1:])
            for d in (os.listdir(logdir) if os.path.isdir(logdir) else [])
            if d.startswith("e")
        )
    else:
        # same ~1-file-per-bucket discipline as the compaction write:
        # without the repartition the seed emits tasks x buckets sliver
        # files that every later fold re-reads
        seeded.withColumn("_bucket", _bucket(seeded)).repartition(
            max(n_buckets // 2, 1), F.col("_bucket")
        ).write.mode("overwrite").partitionBy("_bucket").parquet(
            f"{state_dir}/epoch0"
        )
        manifest = _live_buckets(f"{state_dir}/epoch0")
        pending = []  # epoch ids with an unconsumed log partition
        _save_manifest()

    def _reap_dead_epochs() -> None:
        live = {os.path.dirname(p) for p in manifest.values()}
        for d in os.listdir(state_dir):
            full = os.path.join(state_dir, d)
            if d.startswith("epoch") and full not in live:
                shutil.rmtree(full, ignore_errors=True)

    def _compact() -> None:
        if not pending:
            return
        log = spark.read.parquet(
            *[f"{state_dir}/log/e{e}" for e in pending]
        )
        # net image per key: latest epoch wins (key-partitioned window —
        # no global funnel; log size ∝ churn since the last compaction).
        # Persisted (round 15): two consumers — the touched-bucket
        # collect and the apply_delta fold — otherwise each re-run the
        # log read + window; released right after the epoch write.
        w = Window.partitionBy(*keys).orderBy(F.col("_epoch").desc())
        latest = (
            log.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "_epoch")
            .persist()
        )
        touched = sorted(
            r[0]
            for r in latest.select(_bucket(latest).alias("_b"))
            .distinct()
            .collect()
        )
        cur_paths = [manifest[b] for b in touched if b in manifest]
        cur = (
            spark.read.parquet(*cur_paths)
            if cur_paths
            else spark.createDataFrame([], seeded.schema)
        )
        if io_log is not None:
            io_log.append(
                {
                    "mode": "compact",
                    "epochs": list(pending),
                    "touched": touched,
                    "files_read": list(cur.inputFiles()) if cur_paths else [],
                    "live_files": sum(
                        len(os.listdir(p)) for p in manifest.values()
                    ),
                }
            )
        nxt = apply_delta(cur, latest, keys, value_cols)
        # next epoch id must clear every epoch dir on disk, not just
        # max(pending)+1: after a crash between the manifest commit and
        # the log reap, the replayed fold would otherwise OVERWRITE the
        # live epoch dir it is concurrently reading from
        existing = max(
            (
                int(d[5:])
                for d in os.listdir(state_dir)
                if d.startswith("epoch") and d[5:].isdigit()
            ),
            default=0,
        )
        out_dir = f"{state_dir}/epoch{max(max(pending), existing) + 1}"
        # repartition ON the bucket before partitionBy: otherwise every
        # write task emits a sliver file into every touched bucket dir
        # (tasks x buckets tiny files) and later compactions snowball on
        # the accumulated small-file reads — this pins ~1 file per bucket
        nxt.withColumn("_bucket", _bucket(nxt)).repartition(
            max(len(touched) // 2, 1), F.col("_bucket")
        ).write.mode("overwrite").partitionBy("_bucket").parquet(out_dir)
        latest.unpersist(blocking=False)
        written = _live_buckets(out_dir)
        for b in touched:
            if b in written:
                manifest[b] = written[b]
            else:
                manifest.pop(b, None)  # bucket emptied by deletes
        # COMMIT ORDER (crash-safe): manifest first, logs reaped last. A
        # crash before the manifest commit replays the whole compaction
        # from the old manifest + intact logs; a crash after it re-folds
        # the surviving logs idempotently. Either way no churn is lost.
        _save_manifest()
        _reap_dead_epochs()
        for e in pending:
            shutil.rmtree(f"{state_dir}/log/e{e}", ignore_errors=True)
        pending.clear()

    def _upsert(batch_df: DataFrame, epoch_id: int) -> None:
        # round 15 (guide §1.2): no isEmpty() pre-check — it cost one
        # limit-1 job per micro-batch on top of the write job every batch
        # pays anyway. An empty batch (rare: file-source feeds deliver
        # per-file batches) now appends an empty log partition, which the
        # compaction folds to nothing — same result, and the write of an
        # empty frame costs about what the isEmpty() probe did.
        # hot path: append the batch as a log partition — ZERO reads,
        # one write ∝ this batch's churn
        batch_df.withColumn("_epoch", F.lit(epoch_id)).write.mode(
            "overwrite"
        ).parquet(f"{state_dir}/log/e{epoch_id}")
        # foreachBatch may REDELIVER an epoch after a driver restart (the
        # checkpoint commits after the callback returns); the overwrite
        # above makes the log write idempotent and the dedupe here keeps
        # the pending ledger exactly-once (round 9, VERDICT r8 #4)
        if epoch_id not in pending:
            pending.append(epoch_id)
        if io_log is not None:
            io_log.append(
                {
                    "mode": "append",
                    "epoch": epoch_id,
                    "files_read": [],
                    "live_files": sum(
                        len(os.listdir(p)) for p in manifest.values()
                    ),
                }
            )
        if len(pending) >= compact_every:
            _compact()

    q = (
        delta_stream.writeStream.foreachBatch(_upsert)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .start()
    )
    try:
        done = q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    if not done:
        # the on-disk store is still consistent (manifest-committed) and a
        # re-run on the same state_dir resumes — but the SNAPSHOT promised
        # by this call would be partial, so fail loudly (review r9)
        raise TimeoutError(
            f"apply_delta_stream: stream did not finish within {timeout_s}s;"
            " re-run with the same state_dir to resume"
        )
    _compact()  # fold any remaining log before handing the snapshot out
    if not manifest:
        return spark.createDataFrame([], seeded.schema)
    return spark.read.parquet(*manifest.values()).select(*cols)


def maintain_view_stream(
    delta_stream: DataFrame,
    initial_view: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    *,
    state_dir: str,
    count_col: str = "n_rows",
    timeout_s: int = 300,
) -> DataFrame:
    """Streaming incremental view maintenance: a before-image changefeed
    stream keeps a count/sum materialization current — each micro-batch is
    folded in with the batch ``maintain_sum_view`` adjustment join
    (operators/ivm.py), so per-batch cost ∝ that batch's churn and the base
    table is never consulted at all. Adjustments are additive, so the final
    view is independent of how the feed is batched (a key updated twice
    must arrive with consistent chained before-images — the CDC contract).

    The store is a simple alternating-parquet pair: unlike
    :func:`apply_delta_stream`'s bucketed copy-on-write snapshot, the
    VIEW is an aggregate (one row per group), so a full rewrite per batch
    is ∝ |groups|, not ∝ the base table — tiny at any SF, no pruning
    needed. Runs to completion (AvailableNow) and returns the final
    view."""
    import json
    import os

    from checkatron_spark.operators.ivm import maintain_sum_view

    spark = delta_stream.sparkSession
    marker_path = os.path.join(state_dir, "view_version.json")

    def _save_marker() -> None:
        # atomic (tmp + os.replace), same commit discipline as the LSM
        # store's manifest
        tmp = marker_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(current, fh)
        os.replace(tmp, marker_path)

    if os.path.exists(marker_path):
        # KILL/RESTART RECOVERY (review r9): the old code reset the view
        # to initial_view on every call while the checkpoint SKIPPED the
        # already-committed batches — their adjustments were silently
        # lost. The marker records which v{0,1} slot is live and the last
        # FOLDED epoch; an uncommitted batch replays (epoch > last_epoch)
        # and re-folds from the committed slot, a redelivered committed
        # epoch is skipped (additive folds are NOT idempotent). A wiped
        # checkpoint with surviving state is out of contract here — use a
        # fresh state_dir (apply_delta_stream's upsert store absorbs that
        # case; an additive fold store cannot).
        try:
            os.remove(marker_path + ".tmp")
        except FileNotFoundError:
            pass
        with open(marker_path) as fh:
            current = json.load(fh)
    elif os.path.exists(os.path.join(state_dir, "_checkpoint")):
        # ADVICE r9 (medium): a surviving checkpoint WITHOUT the marker
        # means this state_dir predates the marker protocol (or the
        # marker was lost) — re-initializing to v0 here would silently
        # drop every adjustment the checkpoint will skip, the exact bug
        # the marker fixed, so refuse instead of guessing
        raise RuntimeError(
            f"maintain_view_stream: {state_dir} has a streaming checkpoint"
            " but no view_version.json marker (legacy or partially-wiped"
            " state). Its committed adjustments cannot be recovered —"
            " use a fresh state_dir"
        )
    else:
        os.makedirs(state_dir, exist_ok=True)
        current = {"ver": 0, "last_epoch": -1}
        initial_view.write.mode("overwrite").parquet(f"{state_dir}/v0")
        _save_marker()

    def _fold(batch_df: DataFrame, epoch_id: int) -> None:
        # no isEmpty() pre-check (round 15, guide §1.2): it cost a limit-1
        # job per micro-batch; an empty batch now pays one ∝|groups| fold
        # (identical view — additive adjustments of nothing), which file-
        # source feeds make rare to never
        if epoch_id <= current["last_epoch"]:
            return  # replay of an already-folded batch
        cur = spark.read.parquet(f"{state_dir}/v{current['ver']}")
        nxt = maintain_sum_view(
            cur, batch_df, group_keys, sum_cols, count_col=count_col
        )
        nxt.write.mode("overwrite").parquet(f"{state_dir}/v{1 - current['ver']}")
        current["ver"] = 1 - current["ver"]
        current["last_epoch"] = epoch_id
        _save_marker()

    q = (
        delta_stream.writeStream.foreachBatch(_fold)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{state_dir}/_checkpoint")
        .start()
    )
    try:
        done = q.awaitTermination(timeout_s)
    finally:
        if q.isActive:
            q.stop()
    if not done:
        raise TimeoutError(
            f"maintain_view_stream: stream did not finish within "
            f"{timeout_s}s; re-run with the same state_dir to resume"
        )
    return spark.read.parquet(f"{state_dir}/v{current['ver']}")


# ---------------------------------------------------------------------------
# driver-contract queries: streams drained with AvailableNow, oracle-checked
# against DuckDB batch SQL over the same parquet
# ---------------------------------------------------------------------------

def q_stream_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return drain_to_batch(
        windowed_event_counts(ev), output_mode="complete"
    )


STREAM_WINDOWED_SQL = (
    "SELECT date_trunc('hour', ts) AS window_start, event_type, "
    "COUNT(*) AS n_events, "
    "CAST(SUM(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) "
    "/ 1000000.0 AS sum_value "
    "FROM events GROUP BY 1, 2"
)


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_events_stream(spark, sf_dir)
    return drain_to_batch(sessionize_stateful(ev), output_mode="update")


def q_stream_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming diff of the events stream against a deterministically
    perturbed baseline: events with id % 7 == 0 are absent from the
    baseline (-> _row_status 4) and values at id % 5 == 0 are shifted by
    +1.0 (-> status_value 1)."""
    from checkatron_spark.sources.tables import load_table

    stream = read_events_stream(spark, sf_dir).select(
        "event_id", "event_type", "value"
    )
    baseline = (
        load_table(spark, "events", sf_dir)
        .filter(F.col("event_id") % 7 != 0)
        .select(
            "event_id",
            "event_type",
            F.when(F.col("event_id") % 5 == 0, F.col("value") + F.lit(1.0))
            .otherwise(F.col("value"))
            .alias("value"),
        )
    )
    return drain_to_batch(
        stream_diff(stream, baseline, ["event_id"], ["event_type", "value"]),
        output_mode="append",
        state_partitions=None,  # stateless (stream-static join): keep full width
    )


STREAM_DIFF_SQL = """
WITH baseline AS (
    SELECT event_id, event_type,
           CASE WHEN event_id % 5 = 0 THEN value + 1.0 ELSE value END AS value
    FROM events WHERE event_id % 7 <> 0
)
SELECT e.event_id,
       CAST(CASE WHEN b.event_id IS NULL THEN 4 END AS INTEGER) AS "_row_status",
       CAST(CASE WHEN b.event_type IS NULL AND e.event_type IS NULL THEN 0
                 WHEN b.event_type IS NULL AND e.event_type IS NOT NULL THEN 2
                 WHEN b.event_type IS NOT NULL AND e.event_type IS NULL THEN 3
                 WHEN b.event_type = e.event_type THEN 0 ELSE 1 END
            AS INTEGER) AS status_event_type,
       CAST(CASE WHEN b.value IS NULL AND e.value IS NULL THEN 0
                 WHEN b.value IS NULL AND e.value IS NOT NULL THEN 2
                 WHEN b.value IS NOT NULL AND e.value IS NULL THEN 3
                 WHEN b.value = e.value THEN 0 ELSE 1 END
            AS INTEGER) AS status_value
FROM events e LEFT JOIN baseline b ON e.event_id = b.event_id
"""


STREAM_SESSIONIZE_SQL = """
WITH lagged AS (
    SELECT user_id,
           CASE WHEN lag(ts) OVER w IS NULL
                     OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                THEN 1 ELSE 0 END AS new_sess
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions,
       COUNT(*) AS n_events
FROM lagged GROUP BY user_id
"""


def q_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchases attributed to the clicks that preceded them by <=30 min for
    the same user — two independent readStreams over the events fixture,
    joined with watermarks bounding both state buffers."""
    clicks = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("user_id_l"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    purchases = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id_r"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    joined = stream_stream_interval_join(
        clicks, purchases, "user_id",
        left_ts="click_ts", right_ts="purchase_ts",
    ).select(
        F.col("user_id_l").alias("user_id"),
        "click_id", "purchase_id", "purchase_value",
    )
    return drain_to_batch(joined, output_mode="append")


STREAM_STREAM_JOIN_SQL = """
SELECT c.user_id AS user_id, c.event_id AS click_id,
       p.event_id AS purchase_id, p.value AS purchase_value
FROM events c
JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
"""


def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: the events stream unioned with itself (every
    row arrives twice) then dropDuplicates on event_id under a watermark —
    state is one key per event inside the watermark horizon, the streaming
    counterpart of dedup_exact."""
    a = read_events_stream(spark, sf_dir)
    b = read_events_stream(spark, sf_dir)
    doubled = a.unionByName(b).withWatermark("ts", "1 hour")
    return (
        doubled.dropDuplicates(["event_id"])
        .select("event_id", "user_id", "event_type")
    )


def _q_stream_dedup_drained(spark: SparkSession, sf_dir: str) -> DataFrame:
    # dedup state = one entry per distinct event_id (200k input rows at
    # sf0.1) — wide state, so keep more partitions than the tiny-keyspace
    # sessionizer/join drains
    return drain_to_batch(
        q_stream_dedup(spark, sf_dir), output_mode="append", state_partitions=16
    )


STREAM_DEDUP_SQL = """
SELECT event_id, user_id, event_type
FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
GROUP BY event_id, user_id, event_type
"""


def q_stream_ivm_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming IVM end-to-end: the flagship before-image changefeed is
    replayed as a 4-file stream that keeps the per-priority count+sum view
    current; the final view must hash-match the view recomputed over the
    after snapshot (same oracle as ivm_orders_totals)."""
    import shutil

    from checkatron_spark import workloads as W
    from checkatron_spark.operators.ivm import sum_view
    from checkatron_spark.operators.patch import compact_delta

    work = scratch_tempdir("stream_ivm_")
    try:
        cents = F.floor(
            F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)
        ).cast("bigint")

        def frame(df: DataFrame) -> DataFrame:
            return df.select(
                "o_orderkey", "o_orderpriority", cents.alias("price_c")
            )

        b = frame(W.orders_before(spark, sf_dir))
        a = frame(W.orders_after(spark, sf_dir))
        delta = compact_delta(
            b, a, ["o_orderkey"], ["o_orderpriority", "price_c"],
            include_before=True,
        )
        feed = _cached_feed(spark, "ivm", sf_dir, delta)
        sdf = (
            spark.readStream.schema(delta.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        view = maintain_view_stream(
            sdf,
            sum_view(b, ["o_orderpriority"], ["price_c"]),
            ["o_orderpriority"],
            ["price_c"],
            state_dir=f"{work}/state",
        )
        return view.select(
            "o_orderpriority",
            "n_rows",
            (F.col("sum_price_c").cast("double") / F.lit(100.0)).alias(
                "sum_price"
            ),
        )
    except BaseException:
        shutil.rmtree(work, ignore_errors=True)
        raise


def stream_ivm_totals_sql() -> str:
    from checkatron_spark import workloads as W

    return W.ivm_orders_totals_oracle_sql()


def q_stream_patch_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC materialization end-to-end: the flagship compact delta
    is written as a 4-file changefeed, replayed as a file-source stream one
    file per micro-batch, and foreachBatch-upserted onto the before
    snapshot. The final materialized table must equal the after snapshot
    bit-for-bit (same oracle as apply_delta_roundtrip) — each key occurs
    once in the feed, so the result is independent of batch boundaries."""
    import shutil

    from checkatron_spark import workloads as W

    work = scratch_tempdir("stream_patch_")
    try:
        cols = ["o_orderkey"] + W.DELTA_VALUE_COLS
        base = W.orders_before(spark, sf_dir).select(*cols)
        delta = W.delta_compact_orders(spark, sf_dir)
        feed = _cached_feed(spark, "patch", sf_dir, delta)
        sdf = (
            spark.readStream.schema(delta.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        # the returned DataFrame stays backed by the final snapshot parquet
        # under ``work`` — tiny (∝ snapshot), left for tmp reaping
        return apply_delta_stream(
            sdf, base, ["o_orderkey"], W.DELTA_VALUE_COLS,
            state_dir=f"{work}/state",
        )
    except BaseException:
        shutil.rmtree(work, ignore_errors=True)
        raise


def stream_patch_apply_sql() -> str:
    from checkatron_spark import workloads as W

    return W.apply_delta_roundtrip_oracle_sql()


def q_stream_ivm_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming JOIN-view maintenance, composed from parts that already
    exist: each fact-changefeed micro-batch is enriched against the static
    customer dim in-flight (stream-static broadcast join), which turns a
    FACT delta into a VIEW delta — an 'I'/'U' whose new fk misses the dim
    becomes a 'D' (the row leaves the inner-join view); a previously-
    dangling fact becomes an upsert the store has never seen (apply_delta
    inserts it) — and the resulting view-delta stream is folded by the
    crash-recoverable LSM store (apply_delta_stream). Dim churn is the
    batch operator's job (ivm_join_enriched / maintain_join_view); the
    streaming variant handles the high-rate side, the standard production
    split. Final store must equal the recomputed after⋈dim join
    bit-for-bit.

    The dim is restricted (c_custkey % 41 <> 3) and the feed re-points fks
    (o_orderkey % 37 == 1 → custkey+1) so every conversion path — match,
    dangle, re-point onto a hole, re-point out of one — actually fires at
    every SF."""
    import shutil

    from checkatron_spark import workloads as W
    from checkatron_spark.operators.ivm import join_view
    from checkatron_spark.operators.patch import OP_DELETE, compact_delta
    from checkatron_spark.sources.tables import load_table

    work = scratch_tempdir("stream_ivmjoin_")
    try:
        fact_cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        f_b = W.orders_before(spark, sf_dir).select(*fact_cols)
        f_a = W.orders_after(spark, sf_dir).select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 37 == 1, F.col("o_custkey") + 1)
            .otherwise(F.col("o_custkey"))
            .alias("o_custkey"),
            "o_totalprice",
        )
        dim = (
            load_table(spark, "customer", sf_dir)
            .filter(F.col("c_custkey") % 41 != 3)
            .select(
                F.col("c_custkey").alias("o_custkey"),
                "c_name",
                "c_acctbal",
            )
        )
        view_cols = ["o_custkey", "o_totalprice", "c_name", "c_acctbal"]

        delta = compact_delta(
            f_b, f_a, ["o_orderkey"], ["o_custkey", "o_totalprice"]
        )
        feed = _cached_feed(spark, "ivmjoin", sf_dir, delta)
        sdf = (
            spark.readStream.schema(delta.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(feed)
        )
        hit = dim.withColumn("_dim_hit", F.lit(True))
        enriched = sdf.join(F.broadcast(hit), "o_custkey", "left").select(
            F.when(F.col("_op") == OP_DELETE, F.lit(OP_DELETE))
            .when(F.col("_dim_hit").isNull(), F.lit(OP_DELETE))
            .otherwise(F.col("_op"))
            .alias("_op"),
            "o_orderkey",
            *view_cols,
        )
        base_view = join_view(f_b, dim, "o_custkey").select(
            "o_orderkey", *view_cols
        )
        return apply_delta_stream(
            enriched, base_view, ["o_orderkey"], view_cols,
            state_dir=f"{work}/state",
        )
    except BaseException:
        shutil.rmtree(work, ignore_errors=True)
        raise


def stream_ivm_join_sql() -> str:
    from checkatron_spark import workloads as W

    fk_move = (
        "CASE WHEN o_orderkey % 37 = 1 THEN o_custkey + 1 "
        "ELSE o_custkey END"
    )
    return (
        "SELECT o.o_orderkey, c.o_custkey, o.o_totalprice, "
        "c.c_name, c.c_acctbal "
        f"FROM (SELECT o_orderkey, {fk_move} AS o_custkey, o_totalprice "
        f"FROM {W.AFTER_SRC_SQL}) o "
        "JOIN (SELECT c_custkey AS o_custkey, c_name, c_acctbal "
        "FROM customer WHERE c_custkey % 41 <> 3) c "
        "ON o.o_custkey = c.o_custkey"
    )


def read_documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source readStream over the documents fixture (schema from a
    batch peek, like read_events_stream)."""
    path = f"{sf_dir}/documents.parquet"
    schema = spark.read.parquet(path).schema
    return (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )


def q_stream_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming corpus intake: micro-batched documents flow through the
    SAME quality gate as the batch curation_filter (pipelines.py — quality
    >= 0.5, stopword ratio <= 0.6, predicted-language allowlist) and roll
    up kept-document counts per source in complete mode. This is the
    continuously-maintained intake dashboard of a training-data pipeline:
    at scale the identical plan tails a Kafka/file drop-zone, and the
    aggregation state is one row per source. Oracle = the batch gate
    aggregated the same way (streaming/batch parity is the point)."""
    from checkatron_spark.functions import text as T

    docs = read_documents_stream(spark, sf_dir)
    t = F.col("text")
    kept = docs.select(
        "source",
        T.quality_score(t).alias("quality"),
        T.stopword_ratio(t).alias("stop_ratio"),
        T.lang_id(t).alias("lang_pred"),
    ).filter(
        (F.col("quality") >= 0.5)
        & (F.col("stop_ratio") <= 0.6)
        & F.col("lang_pred").isin("en", "es", "de")
    )
    counts = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_kept"))
    return drain_to_batch(counts, output_mode="complete")


def stream_corpus_curation_sql() -> str:
    from checkatron_spark.pipelines import curation_filter_sql

    return (
        f"SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept FROM (\n"
        f"{curation_filter_sql()}\n) kept GROUP BY source"
    )


def q_stream_admission_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of the incremental-ingestion admission gate
    (operators/dedup.dedup_incremental): the new-batch documents arrive as
    a micro-batched stream, each computes its content fingerprint
    in-flight, and a stream-static LEFT join against the base corpus's
    DISTINCT fingerprint table labels it dup_of_base or new. Stateless —
    the static side broadcasts (or hash-joins) per micro-batch and the
    stream carries no aggregation state, so the gate runs at ingest speed
    forever. (The within-batch first-wins tiebreak is batch-side only: it
    needs an order, and a stream's arrival order is processing-time —
    admitted docs are deduped against the base, then batch-deduped
    downstream at compaction.)"""
    from checkatron_spark.functions.text import fingerprint

    docs = read_documents_stream(spark, sf_dir).filter(
        F.col("doc_id") % 17 == 2
    )
    base_fp = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 17 != 2)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .withColumn("_in_base", F.lit(1))
    )
    gated = (
        docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
        .join(base_fp, "fp", "left")
        .select(
            "doc_id",
            "fp",
            F.when(F.col("_in_base") == 1, F.lit("dup_of_base"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )
    return drain_to_batch(gated, output_mode="append")


def stream_admission_gate_sql() -> str:
    from checkatron_spark.pipelines import _FP

    return f"""
WITH new_fp AS (
    SELECT doc_id, {_FP} AS fp FROM documents WHERE doc_id % 17 = 2
),
base_fp AS (
    SELECT DISTINCT {_FP} AS fp FROM documents WHERE doc_id % 17 <> 2
)
SELECT n.doc_id, n.fp,
       CASE WHEN b.fp IS NOT NULL THEN 'dup_of_base' ELSE 'new' END AS status
FROM new_fp n LEFT JOIN base_fp b USING (fp)
"""


def q_stream_bloom_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming decontamination gate — the Bloom-mask variant of
    stream_admission_gate. The benchmark's grams are folded into the 8 KiB
    literal mask ONCE at plan-build time (operators/dedup.bloom_mask_words),
    and each micro-batch document tests its shingle array against the mask
    as a PURE PROJECTION (higher-order filter over the array, md5+bit
    arithmetic per gram): no stream-static join, no aggregation, no state.
    An append stream of flagged docs that runs at ingest speed forever —
    the shape that holds when the static side of a stream-static join
    would itself be too hot to re-broadcast per batch.

    Oracle: identical flagged set to the batch decontaminate_bloom
    (streaming/batch parity — same mask, same grams, same bits)."""
    from checkatron_spark.operators.dedup import bloom_hits_expr, shingles
    from checkatron_spark.pipelines import _bench_bloom_mask
    from checkatron_spark.sampling import hash_uniform

    words = _bench_bloom_mask(spark, sf_dir)

    docs = read_documents_stream(spark, sf_dir).filter(
        hash_uniform(F.col("doc_id"), "bench-v1") >= 0.05
    )
    flagged = (
        docs.select("doc_id", shingles(F.col("text")).alias("_sh"))
        .withColumn("_bits", F.lit(words))
        .withColumn(
            "n_flagged_grams",
            F.expr(bloom_hits_expr("_sh", "_bits")).cast("bigint"),
        )
        .filter(F.col("n_flagged_grams") >= 1)
        .select("doc_id", "n_flagged_grams")
    )
    return drain_to_batch(flagged, output_mode="append")


def stream_bloom_gate_sql() -> str:
    from checkatron_spark.pipelines import DECONTAMINATE_BLOOM_SQL

    return DECONTAMINATE_BLOOM_SQL


def q_stream_ann_ivf_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN index admission + batch-audit parity (round 14,
    VERDICT r13 #7): the embedding corpus arrives as a 4-file changefeed
    (maxFilesPerTrigger=1 — four genuine micro-batches), and each batch
    ADMITS its vectors into the IVF index as a pure stateless projection:
    grid quantization + the centroid-LITERAL argmin
    (pq.coarse_assign_expr — the codegen twin of the Arrow assignment
    kernel, no Python workers, no state, ingest-speed forever; the
    stream_bloom_gate shape). The quantizer itself is the SAME cached
    batch fit the ann_ivf_grid/ann_ivfpq queries use — fit in batch,
    admit in stream, the production split.

    The drained index then serves the SAME probed search the batch
    recall audit calibrates — so the oracle is LITERALLY ivf_grid_sql:
    streaming admission == batch index build, pinned value-exact (the
    drained-state == batch-result contract, and the strongest parity in
    the streaming family because the entire batch twin's oracle replays
    against the streamed state)."""
    from checkatron_spark.operators.pq import (
        _fit_coarse_cached,
        _ivf_grid_search,
        _quantized,
        coarse_assign_expr,
    )
    from checkatron_spark.pipelines import _emb_cache_key

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    xq_batch = _quantized(emb, "vec_id", "embedding", 10000)
    coarse = _fit_coarse_cached(
        xq_batch, id_col="vec_id", n_cells=8, iters=2, scale=10000,
        fit_sample=256, cache_key=_emb_cache_key(sf_dir),
    )
    feed = _cached_feed(spark, "annadmit", sf_dir, emb)
    schema = emb.schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
    )
    norm = F.expr(
        "sqrt(aggregate(embedding, 0.0D, (acc, v) -> "
        "acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )
    grid = F.expr(
        "transform(embedding, v -> "
        "CAST(floor(CAST(v AS DOUBLE) * 10000.0 + 0.5) AS BIGINT))"
    )
    admitted = (
        sdf.filter(norm > F.lit(0.0))
        .select(F.col("vec_id"), grid.alias("_x"))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            coarse_assign_expr(coarse).alias("cell"),
            "_x",
        )
    )
    index = drain_to_batch(admitted, output_mode="append")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    qx = _quantized(queries, "vec_id", "embedding", 10000) \
        .withColumnRenamed("vec_id", "query_id")
    return _ivf_grid_search(index, coarse, qx, n_probe=2, topk=3)


def stream_ann_ivf_admission_sql() -> str:
    from checkatron_spark.pipelines import ivf_grid_sql

    return ivf_grid_sql(fit_sample=256)


def q_stream_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming Count-Min maintenance: micro-batched documents explode to
    tokens, each token lands in depth md5-derived cells, and a complete-
    mode aggregation keeps the running (row, cell) counters. The state is
    BOUNDED at depth·width cells (4096 at the defaults) FOREVER — unlike a
    per-token count whose state grows with the vocabulary — which is the
    whole reason a streaming frequency monitor rides a sketch. Drained end
    state == the batch-built sketch (counters are additive and
    batching-independent), so the oracle is the batch cells CTE —
    streaming/batch parity, bit for bit."""
    from checkatron_spark.corpus import _cms_cell

    width = 1024
    docs = read_documents_stream(spark, sf_dir)
    toks = docs.select(
        F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
        .alias("tok")
    )
    parts = None
    for d in range(4):
        p = toks.select(
            F.lit(d).alias("row"),
            _cms_cell(F.col("tok"), d, width).alias("cell"),
        )
        parts = p if parts is None else parts.unionAll(p)
    sketch = parts.groupBy("row", "cell").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    return drain_to_batch(sketch, output_mode="complete")


def stream_token_cms_sql() -> str:
    from checkatron_spark.corpus import cms_sketch_ctes

    return f"WITH {cms_sketch_ctes()}\nSELECT row, cell, cnt FROM sketch"


QUERIES = {
    "stream_windowed_counts": q_stream_windowed,
    "stream_sessionize_stateful": q_stream_sessionize,
    "stream_diff_vs_baseline": q_stream_diff,
    "stream_stream_join": q_stream_stream_join,
    "stream_dedup": _q_stream_dedup_drained,
    "stream_patch_apply": q_stream_patch_apply,
    "stream_ivm_totals": q_stream_ivm_totals,
    "stream_ivm_join": q_stream_ivm_join,
    "stream_corpus_curation": q_stream_corpus_curation,
    "stream_admission_gate": q_stream_admission_gate,
    "stream_bloom_gate": q_stream_bloom_gate,
    "stream_token_cms": q_stream_token_cms,
    "stream_ann_ivf_admission": q_stream_ann_ivf_admission,
}


def oracles() -> dict[str, str]:
    return {
        "stream_windowed_counts": STREAM_WINDOWED_SQL,
        "stream_sessionize_stateful": STREAM_SESSIONIZE_SQL,
        "stream_diff_vs_baseline": STREAM_DIFF_SQL,
        "stream_stream_join": STREAM_STREAM_JOIN_SQL,
        "stream_dedup": STREAM_DEDUP_SQL,
        "stream_patch_apply": stream_patch_apply_sql(),
        "stream_ivm_totals": stream_ivm_totals_sql(),
        "stream_ivm_join": stream_ivm_join_sql(),
        "stream_corpus_curation": stream_corpus_curation_sql(),
        "stream_admission_gate": stream_admission_gate_sql(),
        "stream_bloom_gate": stream_bloom_gate_sql(),
        "stream_token_cms": stream_token_cms_sql(),
        "stream_ann_ivf_admission": stream_ann_ivf_admission_sql(),
    }
