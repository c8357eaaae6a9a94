"""Scratch-cache hygiene: the driver runs all 150 contract queries in ONE
JVM, and several operators persist intermediates (shingle tables, LSH
features, funnel stages) that the operator itself can't unpersist — the
caller still needs them at collect time.  session.scratch_persist registers
them; the queries() wrapper releases the backlog at the start of the NEXT
query.  This pins that running a sequence of cache-heavy queries does not
accumulate persisted frames."""

from __future__ import annotations

import os

import __spark_entry__ as entrymod
from checkatron_spark.session import release_scratch, scratch_persist

REQUIRES_TESTDATA = True  # auto-skip without driver fixtures (conftest)

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")

# cache-heavy contract queries: n-gram jaccard + minhash persist shingle /
# feature frames, the funnel persists three stage frames
HEAVY = ["neardup_ngram_jaccard", "neardup_minhash_lsh", "curation_funnel"]


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.getPersistentRDDs().size()


def test_scratch_registry_roundtrip(spark):
    df = spark.range(10).transform(scratch_persist)
    assert df.count() == 10
    assert _n_persistent(spark) >= 1
    assert release_scratch() >= 1
    assert release_scratch() == 0  # registry drained


def test_no_cache_accumulation_across_queries(spark):
    qs = entrymod.full_queries()
    release_scratch()
    baseline = _n_persistent(spark)
    high_water = []
    for name in HEAVY:
        qs[name](spark, SF_DIR).collect()
        high_water.append(_n_persistent(spark))
    # each query may hold its own scratch frames while running, but starting
    # the next query must have released its predecessor's: the count after
    # query k is bounded by baseline + query k's own frames (<= 3 here),
    # NOT the sum over all previous queries
    assert all(h <= baseline + 4 for h in high_water), (
        f"persisted frames accumulate across queries: baseline={baseline}, "
        f"after each heavy query={high_water}"
    )
    release_scratch()
    assert _n_persistent(spark) <= baseline


def test_scratch_cache_context_manager(spark):
    """ADVICE r5: library callers need a sanctioned release point — the
    context manager drains the registry on exit, including on error."""
    import checkatron_spark as ck
    from checkatron_spark.session import _SCRATCH, scratch_cache, scratch_persist

    assert ck.scratch_cache is scratch_cache  # public API export
    df = spark.range(10)
    with scratch_cache():
        scratch_persist(df).count()
        assert len(_SCRATCH) == 1
    assert len(_SCRATCH) == 0 and not df.is_cached

    try:
        with scratch_cache():
            scratch_persist(spark.range(5)).count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert len(_SCRATCH) == 0
