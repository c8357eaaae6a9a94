"""Property-based diff testing (hypothesis): random perturbations of a base
table where every expected status count is computable from the perturbation
log — the upgrade over the reference's six fixed scenarios (SURVEY.md §5.2).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from checkatron_spark import diff, diff_summary

ROWS = 30


@st.composite
def perturbations(draw):
    """A perturbation plan over keys 0..ROWS-1: some keys dropped from
    after, some new keys added, some values changed, some nulled."""
    drop = draw(st.sets(st.integers(0, ROWS - 1), max_size=5))
    add = draw(st.sets(st.integers(ROWS, ROWS + 5), max_size=3))
    survivors = sorted(set(range(ROWS)) - drop)
    change = draw(st.sets(st.sampled_from(survivors or [0]), max_size=8))
    null_out = draw(st.sets(st.sampled_from(survivors or [0]), max_size=4))
    if survivors == []:
        change, null_out = set(), set()
    return drop, add, change - null_out, null_out


@given(perturbations())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_summary_matches_perturbation_log(spark, plan):
    drop, add, change, null_out = plan
    before = spark.createDataFrame(
        [(k, f"v{k}") for k in range(ROWS)], ["k", "v"]
    )
    after_rows = [
        (k, None if k in null_out else (f"CHANGED{k}" if k in change else f"v{k}"))
        for k in range(ROWS)
        if k not in drop
    ] + [(k, f"v{k}") for k in sorted(add)]
    after = spark.createDataFrame(after_rows, "k int, v string")

    s = diff_summary(diff(before, after, ["k"])).collect()[0]
    assert s.total_rows == ROWS + len(add)
    assert s.missing_in_after == len(drop)
    assert s.missing_in_before == len(add)
    assert s.matched_rows == ROWS - len(drop)
    # changed = value-changed or nulled rows that survived
    assert s.changed_rows == len(change) + len(null_out)


@given(
    st.dictionaries(
        st.integers(0, 20), st.one_of(st.none(), st.text(max_size=3)),
        min_size=1, max_size=15,
    )
)
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_self_diff_clean_on_unique_keys(spark, kv):
    """Diffing a unique-keyed table against itself yields all-match,
    including NULL values (both-NULL is status 0).

    (Unique keys matter: with duplicate keys the reference's m-by-n fanout
    cross-pairs every before-row with every after-row in the key group, so
    a self-diff of two DIFFERENT rows sharing a key reports value diffs —
    hypothesis found that counterexample against the naive 'self-diff is
    always clean' property, and it is faithful reference behavior, not a
    bug. duplicate_keys()/assert_unique_keys() exist for exactly this.)"""
    df = spark.createDataFrame(list(kv.items()), "k int, v string")
    d = diff(df, df, ["k"])
    got = d.filter("_row_status IS NOT NULL OR K > 0 OR V > 0").count()
    assert got == 0


@given(perturbations())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_scd2_delta_matches_perturbation_log(spark, plan):
    """SCD2 delta row set is exactly derivable from the perturbation log:
    every dropped/changed/nulled key closes, every added/changed/nulled key
    inserts, untouched keys emit nothing."""
    import pyspark.sql.functions as F

    from checkatron_spark.operators.scd import scd2_delta

    drop, add, change, null_out = plan
    current = spark.createDataFrame(
        [(k, f"v{k}", "2020-01-01 00:00:00") for k in range(ROWS)],
        "k int, v string, vf string",
    ).select("k", "v", F.col("vf").cast("timestamp").alias("valid_from"))
    upd_rows = [
        (k, None if k in null_out else (f"CHANGED{k}" if k in change else f"v{k}"))
        for k in range(ROWS)
        if k not in drop
    ] + [(k, f"v{k}") for k in sorted(add)]
    updates = spark.createDataFrame(upd_rows, "k int, v string")

    delta = scd2_delta(
        current, updates, ["k"], ["v"],
        load_ts=F.lit("2021-01-01 00:00:00").cast("timestamp"),
    )
    got = {(r.action, r.k) for r in delta.collect()}
    touched = change | null_out
    expect = (
        {("close", k) for k in drop | touched}
        | {("insert", k) for k in add | touched}
    )
    assert got == expect
