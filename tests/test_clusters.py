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
