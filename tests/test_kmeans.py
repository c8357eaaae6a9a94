"""Unit tests for the exact-arithmetic Lloyd k-means
(operators/kmeans.py) — a hand-computed 2-D fixture pins the quantization,
argmin tie-break, and centroid re-quantization arithmetic; the
empty-cluster case pins the keep-previous-centroid fallback. The
kmeans_domains oracle pins engine parity at the fixtures' scale."""

from __future__ import annotations

from checkatron_spark.operators.kmeans import kmeans_assign


def _assign(spark, rows, **kw):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return {
        r.vec_id: (r.cluster_id, r.dist)
        for r in kmeans_assign(df, **kw).collect()
    }


def test_kmeans_hand_computed_two_rounds(spark):
    # scale 1000: x = [0,0], [1,0], [1000,1000], [1001,1000]
    # init c0=[0,0], c1=[1,0]
    # round 1: p0->c0; p1,p2,p3 -> c1; refit c1 = [667, 667]
    # round 2: p0,p1 -> c0; p2,p3 -> c1 (exact distances below)
    rows = [
        (0, [0.0, 0.0]),
        (1, [0.001, 0.0]),
        (2, [1.0, 1.0]),
        (3, [1.001, 1.0]),
    ]
    out = _assign(spark, rows, k=2, iters=2, scale=1000)
    assert out[0] == (0, 0)
    assert out[1] == (0, 1)
    assert out[2] == (1, 333 * 333 + 333 * 333)
    assert out[3] == (1, 334 * 334 + 333 * 333)


def test_kmeans_tie_breaks_to_lowest_cluster_id(spark):
    # both centroids identical -> every point equidistant -> all pick cid 0
    rows = [(0, [1.0, 1.0]), (1, [1.0, 1.0]), (2, [5.0, 5.0])]
    out = _assign(spark, rows, k=2, iters=1, scale=1000)
    assert all(cid == 0 for cid, _ in out.values())


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    # round 1: identical init centroids -> every point ties to cid 0, so
    # cid 1 is EMPTY and must keep its init centroid [0,0] through the
    # refit. That surviving centroid then wins the origin points back in
    # round 2 (d=0 beats the moved c0 at [33,0]), and by round 3 the two
    # clusters have separated cleanly: origin -> cid 1, far point -> cid 0.
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.1, 0.0])]
    out = _assign(spark, rows, k=2, iters=3, scale=1000)
    assert out[0] == (1, 0)
    assert out[1] == (1, 0)
    assert out[2] == (0, 0)


def test_kmeans_deterministic_across_runs(spark):
    rows = [(i, [float(i % 7), float(i % 3)]) for i in range(40)]
    a = _assign(spark, rows, k=4, iters=3, scale=100)
    b = _assign(spark, rows, k=4, iters=3, scale=100)
    assert a == b
