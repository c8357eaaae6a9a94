"""Connected-components dedup clustering: chain merging, singletons,
min-label choice, and convergence."""

from __future__ import annotations

from checkatron_spark.operators.dedup import connected_components


def test_chain_and_singleton(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], ["_id"])
    # 0-1-2 chain, 3-4 pair, 5 and 6 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (0, 1), (3, 4)], ["id_a", "id_b"]
    )
    got = {
        r._id: r.cluster_id
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 6}


def test_long_path_converges(spark):
    """A 20-node path needs ~diameter rounds — pins that propagation loops
    to convergence, not a fixed small number of rounds."""
    n = 20
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    got = {
        r._id: r.cluster_id
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_split_by_cluster_never_straddles_pairs(spark):
    from checkatron_spark.operators.dedup import split_by_cluster

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 30)], "doc_id int, text string"
    )
    # three components: {1,2,3}, {10,11}, {20,21,22,23}; rest singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a int, id_b int",
    )
    out = split_by_cluster(
        docs, "text", "doc_id",
        {"train": 0.5, "val": 0.25, "test": 0.25}, pairs=pairs,
    ).collect()
    by_doc = {r.doc_id: r for r in out}
    assert len(by_doc) == 29
    # the leakage guarantee: every pair shares a split (and a cluster)
    for a, b in [(1, 2), (2, 3), (1, 3), (10, 11), (20, 23)]:
        assert by_doc[a].split == by_doc[b].split
        assert by_doc[a].cluster_id == by_doc[b].cluster_id
    # draws are per-CLUSTER: singleton clusters hash on their own id
    assert by_doc[5].cluster_id == 5
    # all three split names reachable over 24 clusters (whp for this salt;
    # deterministic, so this is a fixed fact of the fixture, not flaky)
    assert {r.split for r in out} == {"train", "val", "test"}


def test_path_beyond_old_iteration_budget_converges(spark):
    """VERDICT r6 item 4: a 30-hop chain used to exceed the 25-round
    budget silently. Pointer jumping makes rounds O(log diameter), so the
    default budget now covers it — and the result is still one component
    labeled by its minimum member."""
    n = 30
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    got = {
        r._id: r.cluster_id
        for r in connected_components(nodes, pairs).collect()
    }
    assert got == {i: 0 for i in range(n)}


def test_unconverged_at_max_iter_raises(spark):
    """VERDICT r6 item 4: exiting the label loop at max_iter with labels
    still moving must raise, never return silently-split components."""
    import pytest

    n = 30
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["_id"])
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["id_a", "id_b"]
    )
    with pytest.raises(RuntimeError, match="still changing"):
        connected_components(nodes, pairs, max_iter=2)


# ---------------------------------------------------------------------------
# reelect_representatives: keep-list re-election after takedown
# ---------------------------------------------------------------------------

def test_reelect_promotes_next_surviving_member(spark):
    from checkatron_spark.operators.dedup import reelect_representatives

    # cluster {1,2,3} rep 1; cluster {7} rep 7; cluster {8,9} rep 8
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (7, 7), (8, 8), (9, 8)],
        "doc_id int, cluster_id int",
    )
    # takedown removes 1 (a rep) and 7 (a whole singleton cluster)
    survivors = spark.createDataFrame(
        [(2,), (3,), (8,), (9,)], "doc_id int"
    )
    kept = sorted(
        r.doc_id
        for r in reelect_representatives(labels, survivors).collect()
    )
    # 2 promoted over 1; 8 keeps its seat; cluster {7} vanishes
    assert kept == [2, 8]


def test_reelect_bridge_member_removal_keeps_one_rep(spark):
    """A removed doc that BRIDGED two survivors does not split the
    cluster: labels are from the full graph, so the two survivors still
    share a cluster and only one is kept."""
    from checkatron_spark.operators.dedup import reelect_representatives

    # full-graph cluster {4,5,6} where 5 is the A~5~B bridge; takedown 5
    labels = spark.createDataFrame(
        [(4, 4), (5, 4), (6, 4)], "doc_id int, cluster_id int"
    )
    survivors = spark.createDataFrame([(4,), (6,)], "doc_id int")
    kept = [
        r.doc_id
        for r in reelect_representatives(labels, survivors).collect()
    ]
    assert kept == [4]


def test_reelect_identity_when_nothing_removed(spark):
    """With every member surviving, re-election returns exactly the
    original min-id keep list (dedup_corpus's rule)."""
    from checkatron_spark.operators.dedup import reelect_representatives

    labels = spark.createDataFrame(
        [(3, 3), (4, 3), (10, 10)], "doc_id int, cluster_id int"
    )
    survivors = labels.select("doc_id")
    kept = sorted(
        r.doc_id
        for r in reelect_representatives(labels, survivors).collect()
    )
    assert kept == [3, 10]


def test_triangle_count_hand_graph(spark):
    """K4 minus one edge: 5 edges, 2 triangles, wedges = 2*C(3,2)+2*C(2,2)
    ... computed from degrees (3,3,2,2) -> 3+3+1+1 = 8."""
    from pyspark.sql import functions as F

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a int, b int"
    )  # missing (3,4)
    x = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    y = e.select(F.col("a").alias("t_b"), F.col("b").alias("t_c"))
    z = e.select(F.col("a").alias("t_a"), F.col("b").alias("t_c"))
    tri = x.join(y, "t_b").join(z, ["t_a", "t_c"]).count()
    deg = (
        e.select(F.col("a").alias("v"))
        .unionAll(e.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .collect()
    )
    wedges = sum(r.d * (r.d - 1) // 2 for r in deg)
    assert tri == 2
    assert wedges == 8
