"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]``; the configs below are chosen so the same
logical plans scale to a multi-executor cluster at ~100 TB:

- AQE on (runtime coalescing, skew-join splitting, dynamic broadcast) — the
  diff operator's full-outer join inherits skew handling for free.
- shuffle.partitions sized for the local harness; on a real cluster this is
  overridden (or left to AQE's coalescing with a high initial value).
- Arrow enabled for the Pandas-UDF extension operators (similarity search,
  multimodal decode) so Python exchange is columnar-batched, not per-row.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "checkatron_spark", cpus: str | int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    master = f"local[{cpus or DEFAULT_CPUS}]"
    # scale-adaptive shuffle width (guide §2.2): the local default tracks
    # the harness core count; a cluster deployment overrides via
    # $SPARK_GRAFT_SHUFFLE_PARTITIONS (set it high — e.g. 2-3x total
    # cores — and let AQE coalesce down to ~advisory-sized partitions).
    # AQE coalescing is ON below, so the value is an upper bound on
    # post-shuffle width, not a tuned constant.
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # events.parquet stores TIMESTAMP(NANOS): read as long, loader
        # converts to microsecond timestamps (sources/tables.py)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # the loader's TIMESTAMP_NTZ -> TIMESTAMP normalization and the
        # DuckDB oracles both assume UTC wall-clock; pin it rather than
        # inherit whatever TZ the host happens to run in
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


# ---------------------------------------------------------------------------
# Scratch-cache registry: operators persist intermediate frames that are
# consumed several times WITHIN one query's DAG (shingle tables, LSH
# features, funnel stages).  The frames have no terminal action inside the
# operator — the caller collects — so the operator can't unpersist them
# itself.  Left alone they accumulate in the CacheManager across a long
# driver session (150 queries, one JVM).  Operators register through
# scratch_persist(); release_scratch() drops everything registered so far
# and is invoked at the START of every __spark_entry__ queries() call —
# the previous query has been collected by then, the current one hasn't
# persisted anything yet.
# ---------------------------------------------------------------------------

_SCRATCH: list = []


def scratch_persist(df, level=None):
    """persist() + register for release before the next contract query."""
    from pyspark.storagelevel import StorageLevel

    df = df.persist(level or StorageLevel.MEMORY_AND_DISK)
    _SCRATCH.append(df)
    return df


def scratch_tempdir(prefix: str) -> str:
    """``mkdtemp`` that self-cleans at interpreter exit. Round 13: the
    streaming harness had leaked its work dirs for 13 rounds of sweeps
    and benches (~900 ``stream_*`` dirs / 2.8 GB in /tmp). Exit is the
    right cleanup point — per-query deletion would defeat the per-app
    feed/store caches that make repeat runs cheap; only a SIGKILLed
    process still leaks, and the next process's exit hook is unaffected.

    Round 15 (VERDICT r14 #3, guide §6): the dir holds EPHEMERAL stream
    scratch — checkpoint WAL, the LSM store's log/epoch parquet, the
    replayed feed — whose per-micro-batch commit I/O is the measured
    floor under the streaming trio. Default placement prefers a tmpfs
    (``/dev/shm``) over ``/tmp`` when the latter is disk-backed, since
    RAM-speed commits are the right cost model for drain-to-batch
    scratch that never outlives the process. ``$SPARK_GRAFT_STREAM_SCRATCH``
    overrides (a production deployment points the checkpoint at durable
    storage — resumability across machine loss is ITS contract; this
    path only ever backs bounded, same-process drains and the
    kill-and-resume tests pass their own pinned state dirs)."""
    import atexit
    import shutil
    import tempfile

    base = os.environ.get("SPARK_GRAFT_STREAM_SCRATCH")
    if not base:
        shm = "/dev/shm"
        base = shm if os.path.isdir(shm) and os.access(shm, os.W_OK) else None
    work = tempfile.mkdtemp(prefix=prefix, dir=base)
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return work


def secure_cache_root(override: str | None = None) -> str | None:
    """Resolve the on-disk cache root for cross-process artifacts (PQ
    codebooks, the IVF quantizer) and verify it can be TRUSTED, or return
    ``None`` so callers silently disable caching (ADVICE r13: the old
    shared ``/tmp/checkatron_spark_scratch`` default was world-plantable —
    ``makedirs(mode=0o700)`` only applies when the dir doesn't already
    exist, so anyone pre-creating the path controlled every cached model).

    Resolution order: ``override`` (tests pin a tmp dir), then
    ``$SPARK_GRAFT_SCRATCH``, then a PER-USER default
    ``/tmp/checkatron_spark_scratch-uid<uid>``. Whatever resolves must be
    a real directory (not a symlink) owned by the current uid with no
    group/other write bits — an existing root failing any check yields
    ``None``, never a fallback that silently trusts it."""
    import stat

    root = (
        override
        or os.environ.get("SPARK_GRAFT_SCRATCH")
        or f"/tmp/checkatron_spark_scratch-uid{os.getuid()}"
    )
    try:
        st = os.lstat(root)
    except FileNotFoundError:
        try:
            os.makedirs(root, mode=0o700, exist_ok=True)
            st = os.lstat(root)
        except OSError:
            return None
    except OSError:
        return None
    if not stat.S_ISDIR(st.st_mode):
        return None  # symlink or file planted at the cache path
    if st.st_uid != os.getuid():
        return None
    if st.st_mode & (stat.S_IWGRP | stat.S_IWOTH):
        return None
    return root


def release_scratch() -> int:
    """Unpersist every registered scratch frame; returns how many."""
    n = 0
    while _SCRATCH:
        df = _SCRATCH.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # noqa: BLE001  (dead session — nothing to free)
            pass
    return n


from contextlib import contextmanager


@contextmanager
def scratch_cache():
    """Sanctioned release point for LIBRARY callers (ADVICE r5): operators
    composed outside the ``__spark_entry__`` contract wrapper (which drains
    the registry per ``queries()`` call) would otherwise accumulate
    persisted frames without bound in a long-lived session.  Wrap each
    logical unit of work::

        with scratch_cache():
            result = dedup_corpus(docs, ...).collect()

    Frames registered inside the block are unpersisted on exit (collect
    first — unpersist is correctness-safe, a later action just recomputes).
    Blocks release EVERYTHING registered so far, matching the contract
    wrapper's previous-query-is-done semantics; nesting therefore releases
    the outer block's frames early, which is safe for the same reason."""
    try:
        yield
    finally:
        release_scratch()
