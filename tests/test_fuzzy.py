"""Blocked fuzzy matching: edit-distance semantics, blocking behavior, and
the equi-join (never cartesian) plan shape."""

from __future__ import annotations

from checkatron_spark.operators.dedup import fuzzy_pairs_blocked


def _df(spark):
    rows = [
        (1, "red widget", "A"),
        (2, "red widgit", "A"),   # 1 edit from id 1
        (3, "red widget", "B"),   # identical text, different block -> no pair
        (4, "blue bolt", "A"),    # far from everything
        (5, "red midget", "A"),   # 1 edit from id 1, 2 from id 2
    ]
    return spark.createDataFrame(rows, "id int, name string, brand string")


def test_fuzzy_pairs_within_block_only(spark):
    out = fuzzy_pairs_blocked(_df(spark), "id", "name", ["brand"], max_dist=2)
    got = {(r.id_a, r.id_b): r.dist for r in out.collect()}
    assert got == {(1, 2): 1, (1, 5): 1, (2, 5): 2}


def test_fuzzy_pairs_respects_max_dist(spark):
    out = fuzzy_pairs_blocked(_df(spark), "id", "name", ["brand"], max_dist=1)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {(1, 2), (1, 5)}


def test_decontaminate_flags_overlapping_docs(spark):
    from checkatron_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps"),      # shares 2 grams with bench
         (2, "totally unrelated words here"),   # shares nothing
         (3, "brown fox sleeps all day")],      # shares "brown fox sleeps"
        "doc_id int, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox sleeps")], "doc_id int, text string"
    )
    out = decontaminate(corpus, bench, "text", "doc_id")
    got = {r.doc_id: r.n_matched_grams for r in out.collect()}
    assert got == {1: 2, 3: 1}  # clean doc 2 is absent entirely


def test_decontaminate_broadcasts_benchmark(spark):
    from checkatron_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame([(1, "a b c d")], "doc_id int, text string")
    bench = spark.createDataFrame([(2, "b c d e")], "doc_id int, text string")
    plan = (
        decontaminate(corpus, bench, "text", "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_plan_is_blocked_equi_join(spark):
    plan = (
        fuzzy_pairs_blocked(_df(spark), "id", "name", ["brand"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
