"""Deterministic sampling/splitting: reproducibility, partition-independence,
and salt independence (tests beyond the driver's DuckDB oracle check)."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark.sampling import deterministic_sample, split_assign
from checkatron_spark.sources.tables import load_table

REQUIRES_TESTDATA = True

SF_DIR = "/root/testdata/sf0.001"


def test_sample_reproducible_and_partition_independent(spark):
    docs = load_table(spark, "documents", SF_DIR)
    a = sorted(
        r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()
    )
    # different physical partitioning must not change membership
    b = sorted(
        r.doc_id
        for r in deterministic_sample(docs.repartition(7), "doc_id", 0.2).collect()
    )
    assert a == b
    assert 0 < len(a) < docs.count()


def test_sample_salt_gives_independent_draw(spark):
    docs = load_table(spark, "documents", SF_DIR)
    a = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.5).collect()}
    b = {
        r.doc_id
        for r in deterministic_sample(docs, "doc_id", 0.5, salt="other").collect()
    }
    assert a != b  # same fraction, different salt -> different membership


def test_split_partitions_every_row_exactly_once(spark):
    docs = load_table(spark, "documents", SF_DIR)
    out = split_assign(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r.split: r.n for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    # growing the fraction must only ADD rows (nesting: u < 0.1 => u < 0.2)
    s1 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.1).collect()}
    s2 = {r.doc_id for r in deterministic_sample(docs, "doc_id", 0.2).collect()}
    assert s1 <= s2


def test_weighted_sample_probability_bounds(spark):
    from checkatron_spark.sampling import weighted_sample

    docs = load_table(spark, "documents", SF_DIR)
    # scale large enough that min(1, w*scale) == 1 for every row -> keep all
    assert weighted_sample(docs, "doc_id", "n_chars", 1.0).count() == docs.count()
    # scale 0 -> probability 0 -> keep nothing
    assert weighted_sample(docs, "doc_id", "n_chars", 0.0).count() == 0
    # heavier rows are kept at a higher rate than light rows
    kept = weighted_sample(docs, "doc_id", "n_chars", 2e-5)
    med = docs.approxQuantile("n_chars", [0.5], 0.0)[0]
    heavy_rate = kept.filter(F.col("n_chars") > med).count() / max(
        1, docs.filter(F.col("n_chars") > med).count()
    )
    light_rate = kept.filter(F.col("n_chars") <= med).count() / max(
        1, docs.filter(F.col("n_chars") <= med).count()
    )
    assert heavy_rate > light_rate


def test_topk_per_group_caps_and_determinism(spark):
    from checkatron_spark.sampling import topk_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(44)],
        ["doc_id", "source"],
    )
    out = topk_per_group(df, "doc_id", "source", 5)
    counts = {r.source: r.n for r in out.groupBy("source").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {"big": 5, "small": 4}  # min(k, group size)
    # deterministic: same selection on re-run
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(r.doc_id for r in topk_per_group(df, "doc_id", "source", 5).collect())
    assert a == b
    # different salt -> (almost surely) different selection from 40 rows
    c = sorted(
        r.doc_id
        for r in topk_per_group(df, "doc_id", "source", 5, salt="other").collect()
        )
    assert a != c


def test_interleave_sources_stride_schedule(spark):
    from checkatron_spark.sampling import interleave_sources

    df = spark.createDataFrame(
        [(i, "a" if i < 30 else ("b" if i < 40 else "c")) for i in range(50)],
        ["doc_id", "source"],
    )
    out = interleave_sources(df, "doc_id", "source", {"a": 3.0, "b": 1.0})
    rows = out.collect()
    assert {r.source for r in rows} == {"a", "b"}  # unweighted 'c' dropped
    # per-group positions are the stride lattice (r - 0.5) / w
    pos_a = sorted(r.interleave_pos for r in rows if r.source == "a")
    assert pos_a[0] == 0.5 / 3.0 and abs(pos_a[1] - 1.5 / 3.0) < 1e-12
    pos_b = sorted(r.interleave_pos for r in rows if r.source == "b")
    assert pos_b[:2] == [0.5, 1.5]
    # reading in position order, 'a' fills ~3 of every 4 slots early on
    order = [r.source for r in sorted(rows, key=lambda r: r.interleave_pos)]
    assert order[:8].count("a") == 6


def test_mix_budget_plan_reports_absent_groups(spark):
    """A weight group with NO corpus rows must still get its plan row —
    total absence is the strongest shortfall regime (avail 0, served 0,
    shortfall = full target), not a silently vanished target."""
    from pyspark.sql import functions as F

    from checkatron_spark.sampling import mix_budget_plan

    df = spark.createDataFrame(
        [("en", 100), ("en", 200)], "lang string, toks long"
    )
    out = {
        r.lang: r
        for r in mix_budget_plan(
            df, "lang", F.col("toks"), {"en": 0.5, "ja": 0.5}, 1000
        ).collect()
    }
    assert set(out) == {"en", "ja"}
    ja = out["ja"]
    assert (ja.avail_tokens, ja.target_tokens) == (0, 500)
    assert (ja.sample_rate, ja.n_epochs, ja.served_tokens) == (0.0, 0, 0)
    assert ja.shortfall_tokens == 500
    en = out["en"]  # under-supplied: 300 avail vs 500 target -> 2 epochs
    assert (en.avail_tokens, en.target_tokens, en.n_epochs) == (300, 500, 2)
    assert en.shortfall_tokens == 0


def test_mix_budget_plan_bpe_counts_subwords(spark, duck, tmp_path):
    """Round 12: the BPE-counted mixture plan — availability sums greedy
    subword counts (not whitespace words), graded against the composed
    recursive-CTE oracle; a lang absent from the corpus still gets its
    full-shortfall row."""
    import pandas as pd

    from checkatron_spark.sampling import QUERIES, oracles
    from tests.conftest import assert_same_rows

    rows = [
        (1, "the nation ingested data", "en"),
        (2, "the the the", "en"),
        (3, "uno dos tres", "es"),
        (4, None, "de"),
        (5, "zz qq", None),          # NULL lang keeps a 0-weight row
    ]
    pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    duck.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    df = QUERIES["mix_budget_plan_bpe"](spark, str(tmp_path))
    res = duck.sql(oracles()["mix_budget_plan_bpe"])
    idx = [res.columns.index(c) for c in df.columns]
    assert_same_rows(
        df,
        [tuple(row[i] for i in idx) for row in res.fetchall()],
        duck_cols=df.columns,
    )
    got = {r["lang"]: r for r in df.collect()}
    # fr/zh have weights but no corpus rows: full-shortfall plan rows
    assert got["fr"]["avail_tokens"] == 0
    assert got["fr"]["shortfall_tokens"] == got["fr"]["target_tokens"] > 0
    # subword counting: en avail = doc1 + doc2. doc1 'the nation
    # ingested data' greedy over SUBWORD_VOCAB: the=1, n+ation=2,
    # ing+es+te+d=4, d+at+a=3 -> 10; doc2 'the the the' -> 3. Total 13 —
    # visibly SUBWORD counts (whitespace would say 7).
    assert got["en"]["avail_tokens"] == 13
