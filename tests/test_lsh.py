"""LSH ANN: recall floor against the exact brute-force ranking at the
driver-query parameters (4 tables, unit bucket length)."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark.operators.similarity import (
    ann_bruteforce_topk,
    ann_lsh_topk,
)
from checkatron_spark.sources.tables import load_table

REQUIRES_TESTDATA = True

SF_DIR = "/root/testdata/sf0.001"


def test_lsh_recall_vs_bruteforce(spark):
    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    exact = ann_bruteforce_topk(emb, queries, k=3)
    approx = ann_lsh_topk(emb, queries, k=3, num_tables=4, bucket_length=1.0)

    truth: dict[int, set[int]] = {}
    for r in exact.collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict[int, set[int]] = {}
    for r in approx.collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)

    hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert total > 0
    recall = hits / total
    # 0.992 measured at sf0.1; pin loosely (tiny fixture, higher variance)
    assert recall >= 0.8, f"recall {recall:.2f}"
