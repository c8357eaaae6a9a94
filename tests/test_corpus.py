"""Corpus curation operators: edge cases the fixture documents don't hit
(short/empty docs, overlap math, global-vs-local duplication), plus the
plan claim that chunking is shuffle-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark.corpus import (
    chunk_documents,
    corpus_card,
    dup_ngram_profile,
    repetition_profile,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_chunking_covers_text_exactly(spark):
    text = "x" * 250
    out = chunk_documents(
        _docs(spark, [(1, text)]), size=100, overlap=20
    ).orderBy("chunk_idx")
    rows = out.collect()
    # stride 80: starts 0, 80, 160, 240 -> lengths 100, 100, 90, 10
    assert [r.chunk_start for r in rows] == [0, 80, 160, 240]
    assert [r.chunk_len for r in rows] == [100, 100, 90, 10]
    # overlapping reassembly: strip the 20-char overlap from chunks 1+
    rebuilt = rows[0].chunk_text + "".join(r.chunk_text[20:] for r in rows[1:])
    assert rebuilt == text


def test_chunking_short_and_empty_docs(spark):
    out = chunk_documents(
        _docs(spark, [(1, "tiny"), (2, "")]), size=100, overlap=20
    )
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].chunk_text == "tiny" and rows[1].chunk_len == 4
    assert 2 not in rows  # empty doc yields no chunks


def test_chunking_is_shuffle_free(spark):
    df = chunk_documents(_docs(spark, [(1, "abc")]), size=2, overlap=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dup_ngram_profile_flags_cross_doc_copies(spark):
    shared = "a b c d e f"  # shingles: "a b c d e", "b c d e f" (both shared)
    docs = _docs(
        spark,
        [(1, shared), (2, shared + " unique tail here"), (3, "q r s t u v")],
    )
    out = {r.doc_id: r for r in dup_ngram_profile(docs, n=5).collect()}
    assert out[1].dup_fraction == 1.0  # every shingle also in doc 2
    assert 0.0 < out[2].dup_fraction < 1.0  # shared head, unique tail
    assert out[3].dup_fraction == 0.0  # nothing shared
    # doc shorter than n contributes no row
    short = dup_ngram_profile(_docs(spark, [(9, "a b c")]), n=5)
    assert short.count() == 0


def test_repetition_profile_signals(spark):
    docs = _docs(spark, [(1, "spam spam spam spam"), (2, "all words differ")])
    out = {r.doc_id: r for r in repetition_profile(docs).collect()}
    assert out[1].n_words == 4 and out[1].n_unique_words == 1
    assert out[1].top_word_fraction == 1.0
    assert out[1].top_bigram_fraction == 1.0  # "spam spam" x3 of 3
    assert out[2].unique_ratio == 1.0
    # single-word doc: no bigrams -> null fraction, not a crash
    one = repetition_profile(_docs(spark, [(3, "solo")])).collect()[0]
    assert one.n_words == 1 and one.top_bigram_fraction is None


def test_corpus_card_rollup(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two", "en", "srcA"),
            (2, "three", "en", "srcA"),
            (3, "vier", "de", "srcB"),
        ],
        ["doc_id", "text", "lang", "source"],
    )
    out = {(r.source, r.lang): r for r in corpus_card(docs).collect()}
    a = out[("srcA", "en")]
    assert a.n_docs == 2 and a.total_words == 3
    assert a.total_chars == len("one two") + len("three")
    assert out[("srcB", "de")].n_docs == 1


def test_dup_ngram_profile_plan_is_skew_safe(spark):
    # docfreq must be a groupBy (map-side partial aggregation) joined back
    # on shingle — NOT a count-over-window, which funnels every posting of
    # a hot boilerplate shingle through one reducer. The shingle frame is
    # persisted so the corpus is scanned and exploded once, not twice.
    df = dup_ngram_profile(_docs(spark, [(1, "a b c d e f"), (2, "a b c d e g")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    n_joins = sum(plan.count(j) for j in
                  ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert n_joins == 1, plan
    assert plan.count("InMemoryTableScan") == 2, plan  # both branches cached


def test_vocab_coverage_oov(spark):
    from checkatron_spark.corpus import vocab_coverage

    # vocab = top-2 tokens ("a" x4, "b" x3); "x"/"y"/"z" are OOV
    docs = _docs(spark, [(1, "a a b x"), (2, "a a b b y z")])
    out = {r.doc_id: r for r in vocab_coverage(docs, top_n=2).collect()}
    assert out[1].n_tokens == 4 and out[1].n_oov == 1
    assert out[1].oov_fraction == 0.25
    assert out[2].n_tokens == 6 and out[2].n_oov == 2


def test_chunking_reassembly_invariant(spark):
    # chunk i covers [i*stride, i*stride+size): first chunk + each later
    # chunk minus its overlap prefix must rebuild the text exactly, for any
    # (size, overlap) and text length (multiple of stride, shorter than
    # size, tail shorter than overlap, unicode)
    texts = ["", "q", "abcdefgh", "ab" * 50, "héllo wörld ünïcode" * 3]
    cases = [(1, 0), (5, 2), (7, 6), (100, 20)]
    rows = [(i, t) for i, t in enumerate(texts)]
    for size, overlap in cases:
        out = chunk_documents(
            _docs(spark, rows), size=size, overlap=overlap
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, t in rows:
            chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_idx)
            if not t:
                assert chunks == []
                continue
            rebuilt = chunks[0].chunk_text + "".join(
                c.chunk_text[overlap:] for c in chunks[1:]
            )
            assert rebuilt == t, (size, overlap, i)


def test_cms_sketch_merge_equals_rebuild(spark):
    """SCALE.md 'Aggregation': Count-Min cells merge by plain addition —
    union two partial sketches and re-sum, and every cell equals the
    sketch built over the combined corpus. This is the property that lets
    per-snapshot sketches roll up without re-reading history."""
    from pyspark.sql import functions as F

    from checkatron_spark.corpus import cms_sketch

    def counts_of(rows):
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        return (
            docs.select(
                F.explode(F.split(F.coalesce(F.col("text"), F.lit("")), " "))
                .alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    part_a = [(1, "a b b c"), (2, "c d")]
    part_b = [(3, "b e e"), (4, "a a f")]
    sk_a = cms_sketch(counts_of(part_a), depth=2, width=8)
    sk_b = cms_sketch(counts_of(part_b), depth=2, width=8)
    merged = {
        (r.row, r.cell): r.cnt
        for r in sk_a.unionAll(sk_b)
        .groupBy("row", "cell")
        .agg(F.sum("cnt").alias("cnt"))
        .collect()
    }
    rebuilt = {
        (r.row, r.cell): r.cnt
        for r in cms_sketch(counts_of(part_a + part_b), depth=2, width=8).collect()
    }
    assert merged == rebuilt and rebuilt


def test_dedup_corpus_staged_equals_unstaged(spark):
    """dedup_corpus_staged must keep EXACTLY the rows dedup_corpus keeps:
    exact-equal docs have identical shingle sets, so collapsing them first
    quotients the same near-dup components. Fixture mixes exact-dup
    cliques, near-dup (non-equal) pairs, a NULL/empty-text clique, and
    singletons — every staging-relevant shape."""
    from checkatron_spark.operators.dedup import dedup_corpus, dedup_corpus_staged

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (5, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (3, "alpha beta gamma delta epsilon zeta"),   # exact dup of 1
        (4, "alpha beta gamma delta epsilon eta"),    # NEAR dup of the clique
        (6, "totally different content over here now"),
        (7, None),                                    # NULL folds to ''
        (8, ""),                                      # exact dup of 7's fold
        (9, "a lone unique document nothing shares"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    kw = dict(n=3, threshold=0.6)
    want = sorted(r.doc_id for r in dedup_corpus(docs, "text", "doc_id", **kw).collect())
    got = sorted(r.doc_id for r in dedup_corpus_staged(docs, "text", "doc_id", **kw).collect())
    assert got == want
    # sanity on the shape itself: the 1/3/5(+4 near) clique keeps 1, the
    # NULL/'' clique keeps 7, singletons survive
    assert got == [1, 6, 7, 9]


def test_dedup_corpus_staged_shrinks_pair_stage(spark):
    """The point of staging: an exact-dup clique of size m feeds the pair
    stage ONE node instead of m (killing the O(m^2) verified-pair term).
    With 20 copies of one doc, unstaged verifies 190 intra-clique pairs;
    staged verifies none."""
    from checkatron_spark.operators.dedup import neardup_ngram_jaccard

    base = "shared words in a long enough duplicated document body"
    rows = [(i, base) for i in range(20)] + [(99, "unique other text entirely")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    unstaged_pairs = neardup_ngram_jaccard(docs, "text", "doc_id", n=3, threshold=0.8).count()
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    reps = (
        docs.select("doc_id", fp.alias("_fp"))
        .groupBy("_fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    rep_docs = docs.join(reps, "doc_id", "left_semi")
    staged_pairs = neardup_ngram_jaccard(rep_docs, "text", "doc_id", n=3, threshold=0.8).count()
    assert unstaged_pairs == 190 and staged_pairs == 0


def test_dedup_canonical_collapses_same_source_only(spark):
    """Round 11 (VERDICT r10 #8): canonical-key dedup keeps one doc per
    (source, content-fp) — recrawls of the same source collapse to the
    min id, while the SAME text mirrored across different sources
    survives (cross-source collapse is the exact stage's job)."""
    from checkatron_spark.operators.dedup import dedup_canonical

    rows = [
        (1, "the same page body", "srcA"),
        (2, "the same page body", "srcA"),    # recrawl -> dropped
        (3, "the same page body", "srcB"),    # mirror  -> kept
        (4, "unique body", "srcA"),
        (5, None, "srcA"),                    # NULL folds to ''
        (6, "", "srcA"),                      # same fold, same source -> drop
        (7, "", "srcB"),                      # same fold, other source -> keep
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    kept = sorted(
        r.doc_id
        for r in dedup_canonical(docs, "text", "doc_id").collect()
    )
    assert kept == [1, 3, 4, 5, 7]
    # all columns survive intact
    out = dedup_canonical(docs, "text", "doc_id")
    assert out.columns == ["doc_id", "text", "source"]


def test_dedup_canonical_null_source_is_a_real_group(spark):
    from checkatron_spark.operators.dedup import dedup_canonical

    rows = [
        (1, "body", None), (2, "body", None),   # NULL source groups together
        (3, "body", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    kept = sorted(
        r.doc_id for r in dedup_canonical(docs, "text", "doc_id").collect()
    )
    assert kept == [1, 3]


def test_dedup_corpus_staged_canonical_output_unchanged_and_funnel(spark):
    """The canonical stage composes into dedup_corpus_staged with output
    PROVABLY unchanged (the global min-id per fp survives the canonical
    subgroup min), and the funnel reduction is measurable stage by
    stage: canonical < input on recrawl-heavy corpora, exact <=
    canonical, near-dup <= exact."""
    from checkatron_spark.operators.dedup import (
        dedup_canonical,
        dedup_corpus,
        dedup_corpus_staged,
    )

    base = "shared words in a long enough duplicated document body"
    rows = (
        # 6 recrawls of one page on srcA + 2 mirrors on srcB
        [(i, base, "srcA") for i in range(6)]
        + [(10, base, "srcB"), (11, base, "srcB")]
        # a near-dup (not exact) of the clique
        + [(20, base + " extra", "srcC")]
        + [(30, "unique other text entirely", "srcA")]
    )
    docs = spark.createDataFrame(rows, "doc_id int, text string, source string")
    kw = dict(n=3, threshold=0.6)
    want = sorted(
        r.doc_id for r in dedup_corpus(docs, "text", "doc_id", **kw).collect()
    )
    got = sorted(
        r.doc_id
        for r in dedup_corpus_staged(
            docs, "text", "doc_id", canonical_cols=("source",), **kw
        ).collect()
    )
    assert got == want == [0, 30]
    # funnel-reduction measurement: 10 -> canonical 4 (0, 10, 20, 30)
    # -> exact 3 (0, 20, 30) -> near-dup 2
    n_canon = dedup_canonical(docs, "text", "doc_id").count()
    assert (docs.count(), n_canon, len(got)) == (10, 4, 2)


def test_lm_bigram_coverage_orders_text_by_reference_fit(spark):
    """Round 6: the exact-arithmetic CCNet stand-in must rank documents
    the way a reference LM would — reference-like text scores high
    known_frac/mean_band, gibberish scores zero, and sub-bigram docs
    report zeros instead of vanishing."""
    from checkatron_spark.corpus import lm_bigram_coverage

    ref = spark.createDataFrame(
        [(100 + i, "the cat sat on the mat") for i in range(20)],
        "doc_id int, text string",
    )
    tgt = spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),       # pure reference text
            (2, "zq xv qqq www eee rrr"),        # gibberish: nothing known
            (3, "the cat zq xv"),                # half known
            (4, "single"),                       # < 2 words -> all zeros
            (5, None),                           # NULL folds -> zeros
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in lm_bigram_coverage(tgt, ref).collect()}
    assert rows[1].known_frac == 1.0 and rows[1].n_bigrams == 5
    # 'the cat'/'cat sat'/etc occur 20x in the reference -> band 2 (>=16)
    assert rows[1].mean_band == 2.0
    assert rows[2].known_frac == 0.0 and rows[2].band_sum == 0
    assert 0.0 < rows[3].known_frac < 1.0
    assert rows[4].n_bigrams == 0 and rows[4].known_frac == 0.0
    assert rows[5].n_bigrams == 0 and rows[5].mean_band == 0.0
    assert len(rows) == 5  # every target doc reports


# ---------------------------------------------------------------------------
# pmi_collocations
# ---------------------------------------------------------------------------

def test_pmi_collocations_hand_computed(spark):
    """3 docs, one dominant collocation: counts and the PMI value match the
    by-hand computation ln(n_ab * N_uni^2 / (n_a * n_b * N_bi))."""
    import math

    from checkatron_spark.corpus import pmi_collocations

    docs = spark.createDataFrame(
        [(1, "new york new york"), (2, "new york"), (3, "york new")],
        "doc_id bigint, text string",
    )
    out = {
        r.bigram: r
        for r in pmi_collocations(docs, min_count=2).collect()
    }
    # unigrams: new=4, york=4, N_uni=8; bigrams: "new york"x3 (doc1 has 2,
    # doc2 has 1), "york new"x2 (doc1 bridge + doc3), N_bi=5
    assert out["new york"].n_pair == 3
    assert out["new york"].n_left == 4 and out["new york"].n_right == 4
    want = round(math.log((3 * 8.0 * 8.0) / (4 * 4.0 * 5.0)), 6)
    assert abs(out["new york"].pmi - want) < 1e-9
    assert out["york new"].n_pair == 2


def test_pmi_collocations_min_count_floor_and_degenerate_docs(spark):
    """NULL text, empty text, and one-word docs produce no bigrams and do
    not crash; pairs below min_count are excluded."""
    from checkatron_spark.corpus import pmi_collocations

    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "solo"), (4, "a b"), (5, "a b"), (6, "c d")],
        "doc_id bigint, text string",
    )
    rows = pmi_collocations(docs, min_count=2).collect()
    assert [r.bigram for r in rows] == ["a b"]
    assert rows[0].n_pair == 2


def test_pmi_vertical_tab_parity_spark_vs_oracle(spark, duck, tmp_path):
    """ADVICE r9: Java's \\s includes \\x0B (vertical tab), RE2's does not
    — under the old \\s-based tokenization a \\x0B-padded doc tokenized
    differently across engines (Spark stripped it as whitespace, DuckDB
    kept it inside tokens). Both now use the explicit [ \\t\\n\\r\\f]
    class, so the PMI tables must be row-identical on a fixture that
    actually contains vertical tabs."""
    import pandas as pd

    from checkatron_spark.corpus import PMI_COLLOCATIONS_SQL, q_pmi_collocations

    rows = [(i, "alpha beta") for i in range(1, 7)] + [
        (7, "\x0b"),                     # VT-only doc: one token, both engines
        (8, "\x0balpha beta\x0b"),        # VT glued to tokens, not stripped
        (9, "alpha\x0bbeta alpha\x0bbeta alpha\x0bbeta alpha\x0bbeta "
            "alpha\x0bbeta alpha\x0bbeta"),  # VT inside a frequent token
        (10, None),
        (11, "\t\n  "),                   # true-whitespace doc: dropped
    ]
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    duck.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    df = q_pmi_collocations(spark, str(tmp_path))
    got = sorted(tuple(r) for r in df.collect())
    res = duck.sql(PMI_COLLOCATIONS_SQL)
    idx = [res.columns.index(c) for c in df.columns]
    want = sorted(tuple(row[i] for i in idx) for row in res.fetchall())
    assert got == want
    # the VT-joined bigram survives the min_count floor on both engines
    assert any("\x0b" in r[0] for r in got)


# ---------------------------------------------------------------------------
# quality_floor_by_source (round 10)


def test_quality_floor_is_adaptive_per_source(spark):
    """Two sources with different quality distributions must get DIFFERENT
    floors (the point of per-source adaptation), NULL-text docs are
    excluded from both the quantile and the kept set, and ties at the
    floor drop (strict inequality)."""
    from checkatron_spark.corpus import (
        quality_floor_by_source,
        quality_floor_kept,
    )

    # source A: long, stopword-rich docs (high quality); source B: short,
    # punctuation-heavy docs (low quality). One NULL-text doc per source.
    a_doc = ("the and of to in " * 12).strip()
    b_doc = "x!!! ??? ###"
    rows = (
        [(i, a_doc, "en", "A", len(a_doc)) for i in range(1, 11)]
        + [(100 + i, b_doc, "en", "B", len(b_doc)) for i in range(1, 11)]
        + [(900, None, "en", "A", 0), (901, None, "en", "B", 0)]
    )
    docs = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    audit = {r.source: r for r in quality_floor_by_source(docs).collect()}
    assert audit["A"].n_docs == 11 and audit["A"].n_scored == 10
    assert audit["B"].n_docs == 11 and audit["B"].n_scored == 10
    assert audit["A"].quality_floor > audit["B"].quality_floor
    # every scored doc in a source ties at that source's single quality
    # value == the floor -> strict inequality keeps NOTHING (mass-tie can
    # never keep more than 1-frac)
    assert audit["A"].n_kept == 0 and audit["B"].n_kept == 0
    kept = quality_floor_kept(docs).collect()
    assert kept == []

    # now break the tie: one strictly-better doc per source must be the
    # only survivor of its source
    better_a = a_doc + " the and of extra words on it goes for length"
    rows2 = rows + [
        (500, better_a, "en", "A", len(better_a)),
        (501, "the and of to in plain words here", "en", "B", 34),
    ]
    docs2 = spark.createDataFrame(
        rows2, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint"
    )
    kept2 = {(r.doc_id, r.source) for r in quality_floor_kept(docs2).collect()}
    assert kept2 == {(500, "A"), (501, "B")}


def test_novelty_first_seer_rule(spark):
    from checkatron_spark.corpus import novelty_profile

    docs = spark.createDataFrame(
        [
            # doc 1 coins every gram it has (3 grams)
            (1, "alpha beta gamma delta epsilon"),
            # doc 2 repeats doc 1's text -> 0% novel, derivative
            (2, "alpha beta gamma delta epsilon"),
            # doc 3 shares one gram with doc 1, coins three of four
            (3, "alpha beta gamma zeta eta theta"),
            # sub-n doc: one whole-doc shingle, unseen -> 100% novel
            (4, "iota kappa"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in novelty_profile(docs).collect()}
    assert out[1]["n_novel"] == out[1]["n_grams"] == 3
    assert out[1]["novelty_pct"] == 100.0 and not out[1]["is_derivative"]
    assert out[2]["n_novel"] == 0 and out[2]["is_derivative"]
    assert out[3]["n_grams"] == 4 and out[3]["n_novel"] == 3
    assert out[4]["n_grams"] == 1 and out[4]["novelty_pct"] == 100.0


def test_ccnet_buckets_cut_per_language(spark):
    from checkatron_spark.corpus import ccnet_ppl_buckets

    # reference: bigram "x1 x2" seen 16x (band 2), "y1 y2" 4x (band 1),
    # "z1 z2" once (band 0) — so target mean_band takes graded values
    ref_rows = (
        [(100 + i, "x1 x2") for i in range(16)]
        + [(200 + i, "y1 y2") for i in range(4)]
        + [(300, "z1 z2")]
    )
    ref = spark.createDataFrame(ref_rows, ["doc_id", "text"])
    # two languages; within EACH, six graded registers (mean_band
    # 2 / 1.5 / 1 / 0.5 / 0 / 0). A global cut would fold the languages
    # together; per-language terciles must split BOTH three ways, and
    # with 6 distinct-ish scores every bucket is non-empty under any
    # discrete-quantile rank convention.
    texts = [
        "x1 x2",                 # mean_band 2.0
        "x1 x2 q y1 y2",         # 1.5
        "y1 y2",                 # 1.0
        "y1 y2 q z1 z2",         # 0.5
        "z1 z2",                 # 0.0 (band-0 known gram)
        "unk1 unk2",             # 0.0 (nothing known)
    ]
    tgt_rows = [
        (base + j, text, lang)
        for lang, base in (("en", 0), ("fr", 30))
        for j, text in enumerate(texts)
    ]
    tgt = spark.createDataFrame(tgt_rows, ["doc_id", "text", "lang"])
    out = ccnet_ppl_buckets(
        tgt.select("doc_id", "text"),
        ref,
        tgt.select("doc_id", "lang"),
    ).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], set()).add(r["bucket"])
    assert by_lang == {"en": {"head", "middle", "tail"},
                       "fr": {"head", "middle", "tail"}}
    # the top register is head in BOTH languages; zero scores are tail
    bucket = {r["doc_id"]: r["bucket"] for r in out}
    assert bucket[0] == "head" and bucket[30] == "head"
    assert bucket[4] == bucket[5] == "tail"
    assert bucket[34] == bucket[35] == "tail"


def test_ccnet_buckets_keep_docs_missing_from_lang_map(spark):
    """ADVICE r10: the docstring promises output for EVERY target doc —
    a doc absent from lang_by_id must surface in the NULL-lang tercile
    group (LEFT join + eqNullSafe), not vanish."""
    from checkatron_spark.corpus import ccnet_ppl_buckets

    ref = spark.createDataFrame(
        [(100 + i, "x1 x2") for i in range(4)], ["doc_id", "text"]
    )
    tgt = spark.createDataFrame(
        [(1, "x1 x2"), (2, "x1 x2 q unk1"), (3, "unk1 unk2"),
         (4, "x1 x2"), (5, "unk3 unk4"), (6, "x1 x2 q q")],
        ["doc_id", "text"],
    )
    # the lang map covers only half the targets
    lang = spark.createDataFrame(
        [(1, "en"), (2, "en"), (3, "en")], ["doc_id", "lang"]
    )
    out = {r["doc_id"]: r for r in ccnet_ppl_buckets(tgt, ref, lang).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6}
    assert all(out[i]["lang"] is None for i in (4, 5, 6))
    # the unmapped docs form their own tercile group: distinct scores
    # split across buckets within the NULL-lang group
    assert {out[i]["bucket"] for i in (4, 5, 6)} > {"tail"}
