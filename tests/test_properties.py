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


# ---------------------------------------------------------------------------
# corpus-family properties: random small documents over a tiny vocabulary
# (to force shingle/token collisions) checked against exact Python mirrors
# of each operator's definition.
# ---------------------------------------------------------------------------

_WORDS = ["a", "b", "c", "d", "e"]

_docs_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=8).map(" ".join),
    min_size=2,
    max_size=6,
)


def _shingle_set(text: str, n: int) -> set[str]:
    w = text.split(" ")
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


@given(_docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dup_ngram_profile_matches_python_mirror(spark, texts):
    from checkatron_spark.corpus import dup_ngram_profile

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = {
        r.doc_id: r
        for r in dup_ngram_profile(docs, n=2, min_docs=2).collect()
    }
    sets = {i: _shingle_set(t, 2) for i, t in enumerate(texts)}
    df_count = {}
    for s in set().union(*sets.values()):
        df_count[s] = sum(1 for v in sets.values() if s in v)
    for i, shingles in sets.items():
        if not shingles:
            assert i not in got
            continue
        n_dup = sum(1 for s in shingles if df_count[s] >= 2)
        assert got[i].n_shingles == len(shingles)
        assert got[i].n_dup == n_dup
        assert abs(got[i].dup_fraction - n_dup / len(shingles)) < 1e-6


@given(_docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_vocab_coverage_matches_python_mirror(spark, texts):
    from checkatron_spark.corpus import vocab_coverage

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = {r.doc_id: r for r in vocab_coverage(docs, top_n=3).collect()}
    counts: dict[str, int] = {}
    for t in texts:
        for tok in t.split(" "):
            counts[tok] = counts.get(tok, 0) + 1
    vocab = {
        tok for tok, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    }
    for i, t in enumerate(texts):
        toks = t.split(" ")
        n_oov = sum(1 for tok in toks if tok not in vocab)
        assert got[i].n_tokens == len(toks)
        assert got[i].n_oov == n_oov
        assert abs(got[i].oov_fraction - n_oov / len(toks)) < 1e-6


@given(_docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_repetition_profile_matches_python_mirror(spark, texts):
    from checkatron_spark.corpus import repetition_profile

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = {r.doc_id: r for r in repetition_profile(docs).collect()}
    for i, t in enumerate(texts):
        words = t.split(" ")
        wc: dict[str, int] = {}
        for w in words:
            wc[w] = wc.get(w, 0) + 1
        row = got[i]
        assert row.n_words == len(words)
        assert row.n_unique_words == len(wc)
        assert abs(row.unique_ratio - len(wc) / len(words)) < 1e-6
        assert abs(row.top_word_fraction - max(wc.values()) / len(words)) < 1e-6
        bigrams = [" ".join(words[j:j + 2]) for j in range(len(words) - 1)]
        if not bigrams:
            assert row.top_bigram_fraction is None
        else:
            bc: dict[str, int] = {}
            for b in bigrams:
                bc[b] = bc.get(b, 0) + 1
            assert abs(
                row.top_bigram_fraction - max(bc.values()) / len(bigrams)
            ) < 1e-6


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


@given(_docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_strip_boilerplate_matches_python_mirror(spark, texts):
    """Random word-salad corpora: strip_boilerplate must equal a direct
    python mirror of the spec (non-overlapping k-word tiles, docfreq >=
    min_docs removed, in-order rebuild)."""
    from checkatron_spark.corpus import strip_boilerplate

    k = 2
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    got = {
        r.doc_id: r for r in strip_boilerplate(docs, k=k, min_docs=2).collect()
    }
    tiles = {
        i: [
            " ".join(t.split(" ")[j:j + k])
            for j in range(0, len(t.split(" ")), k)
        ]
        for i, t in enumerate(texts)
    }
    df_count = {}
    for ts in tiles.values():
        for c in set(ts):
            df_count[c] = df_count.get(c, 0) + 1
    for i, ts in tiles.items():
        kept = [c for c in ts if df_count[c] < 2]
        assert got[i].clean_text == " ".join(kept)
        assert got[i].n_chunks == len(ts)
        assert got[i].n_removed == len(ts) - len(kept)


@given(
    st.lists(st.sampled_from(["x", "y", "z"]), min_size=5, max_size=40),
    st.floats(min_value=0.1, max_value=1.0),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_temperature_sample_rate_law(spark, groups, frac):
    """For every group: kept subset of input, and the DOMINANT group's
    acceptance rate is exactly budget_frac (its hash draws below frac are
    kept, the rest dropped) — mirrored row-by-row in python via the same
    md5 draw."""
    import hashlib

    from checkatron_spark.sampling import temperature_sample

    rows = [(i, g) for i, g in enumerate(groups)]
    df = spark.createDataFrame(rows, "k int, g string")
    kept = {
        (r.k, r.g)
        for r in temperature_sample(
            df, "k", "g", budget_frac=frac, salt="prop-v1"
        ).collect()
    }
    assert kept <= set(rows)
    from collections import Counter

    sizes = Counter(g for _, g in rows)
    n_max = max(sizes.values())

    def draw(key: int) -> float:
        h = hashlib.md5(f"prop-v1:{key}".encode()).hexdigest()[:8]
        return int(h, 16) / 2**32

    import math

    for i, g in rows:
        rate = min(1.0, frac * math.sqrt(n_max / sizes[g]))
        assert ((i, g) in kept) == (draw(i) < rate)


@given(_docs_strategy, _docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_neardup_incremental_matches_python_mirror(spark, new_texts, base_texts):
    """The bipartite prefix-filter join must find EXACTLY the cross pairs a
    naive python all-pairs Jaccard finds — the prefix lemma may prune
    candidates but never a qualifying pair."""
    from checkatron_spark.operators.dedup import neardup_incremental

    t = 0.5
    new = spark.createDataFrame(
        [(i, s) for i, s in enumerate(new_texts)], "doc_id int, text string"
    )
    base = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(base_texts)],
        "doc_id int, text string",
    )
    got = {
        (r.new_id, r.base_id): r.jaccard
        for r in neardup_incremental(
            new, base, "text", "doc_id", n=2, threshold=t
        ).collect()
    }
    def sh(s):
        w = s.split(" ")
        if len(w) < 2:
            return {" ".join(w)}
        return {" ".join(w[i:i + 2]) for i in range(len(w) - 1)}
    want = {}
    for i, a in enumerate(new_texts):
        for j, b in enumerate(base_texts):
            inter = len(sh(a) & sh(b))
            union = len(sh(a) | sh(b))
            if union and inter / union >= t:
                want[(i, 100 + j)] = inter / union
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12


@given(_docs_strategy, _docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_incremental_matches_python_mirror(spark, new_texts, base_texts):
    from checkatron_spark.operators.dedup import dedup_incremental

    def norm(s):
        import re as _re
        s = _re.sub(r"[^a-z0-9 ]", "", s.lower())
        return _re.sub(r" +", " ", s).strip()

    new = spark.createDataFrame(
        [(i, s) for i, s in enumerate(new_texts)], "doc_id int, text string"
    )
    base = spark.createDataFrame(
        [(100 + i, s) for i, s in enumerate(base_texts)],
        "doc_id int, text string",
    )
    got = {r.doc_id: r.status
           for r in dedup_incremental(new, base, "text", "doc_id").collect()}
    base_norms = {norm(s) for s in base_texts}
    seen = {}
    want = {}
    for i, s in enumerate(new_texts):
        k = norm(s)
        if k in base_norms:
            want[i] = "dup_of_base"
        elif k in seen:
            want[i] = "dup_in_batch"
        else:
            want[i] = "new"
        seen.setdefault(k, i)
    assert got == want


@given(_docs_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cms_estimate_never_undercounts(spark, texts):
    """Count-Min's one-sided error law: collisions only ever ADD, so for
    every audited token cms_estimate >= exact_count, and exact_count must
    equal the true python-side count."""
    from collections import Counter

    from checkatron_spark.corpus import token_heavy_hitters_cms

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    # narrow width forces real collisions so the >= bound is exercised
    rows = token_heavy_hitters_cms(
        docs, depth=2, width=8, top_n=10
    ).collect()
    truth = Counter(t for text in texts for t in text.split(" "))
    assert rows, texts
    for r in rows:
        assert r.exact_count == truth[r.token]
        assert r.cms_estimate >= r.exact_count


@given(_docs_strategy)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_dedup_spans_partitions_chunks(spark, texts):
    """Keep-first span dedup bookkeeping: across the corpus the kept-chunk
    total equals the number of DISTINCT chunk texts (exactly one winner
    each), and per document n_kept <= n_chunks with every chunk counted."""
    from checkatron_spark.corpus import dedup_spans_keep_first

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    rows = dedup_spans_keep_first(docs, k=2).collect()
    chunks = []
    for t in texts:
        w = t.split(" ")
        chunks.extend(
            " ".join(w[i: i + 2]) for i in range(0, len(w), 2)
        )
    assert sum(r.n_chunks for r in rows) == len(chunks)
    assert sum(r.n_kept for r in rows) == len(set(chunks))
    for r in rows:
        assert 0 <= r.n_kept <= r.n_chunks


_three_snapshots = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(" ".join),
    min_size=3,
    max_size=9,
)


@given(_three_snapshots)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cms_merge_algebra_across_snapshot_chains(spark, texts):
    """VERDICT r5 item 7: the pairwise merge==rebuild pin is not what a
    100 TB rollup relies on — CHAINS are. Over 3 snapshots the sketch
    algebra must be associative, commutative, and equal to the rebuild of
    the concatenated corpus, regardless of fold order."""
    from checkatron_spark.corpus import cms_merge, cms_sketch

    third = max(1, len(texts) // 3)
    snaps = [texts[:third], texts[third : 2 * third], texts[2 * third :]]

    from pyspark.sql import functions as F

    def sketch(ts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ts)], "doc_id int, text string"
        )
        counts = (
            docs.select(F.explode(F.split("text", " ")).alias("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        # narrow width forces shared collision cells across snapshots
        return cms_sketch(counts, depth=2, width=8)

    def cells(df):
        return {(r.row, r.cell): r.cnt for r in df.collect()}

    a, b, c = (sketch(s) for s in snaps)
    left = cells(cms_merge(cms_merge(a, b), c))
    right = cells(cms_merge(a, cms_merge(b, c)))
    flipped = cells(cms_merge(c, a, b))
    rebuild = cells(sketch(snaps[0] + snaps[1] + snaps[2]))
    assert left == right == flipped == rebuild


@given(_three_snapshots)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_mask_merge_algebra_across_snapshot_chains(spark, texts):
    """Bloom twin of the CMS chain pin: per-snapshot masks OR together
    associatively/commutatively/idempotently into exactly the mask built
    from the concatenated benchmark — so incremental mask maintenance can
    fold snapshots in any order and re-fold without drift."""
    from checkatron_spark.operators.dedup import bloom_mask_words, bloom_merge_masks

    third = max(1, len(texts) // 3)
    snaps = [texts[:third], texts[third : 2 * third], texts[2 * third :]]

    def mask(ts):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(ts)], "doc_id int, text string"
        )
        return bloom_mask_words(df, "text", n=2, m_bits=256, k=2)

    a, b, c = (mask(s) for s in snaps)
    chained = bloom_merge_masks(bloom_merge_masks(a, b), c)
    assert chained == bloom_merge_masks(a, bloom_merge_masks(b, c))
    assert chained == bloom_merge_masks(c, b, a)
    # idempotent: re-merging an already-merged snapshot is a no-op
    assert bloom_merge_masks(chained, b, chained) == chained
    # merge-of-parts == rebuild-of-whole
    assert chained == mask(snaps[0] + snaps[1] + snaps[2])


_dup_heavy_docs = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=1, max_size=6).map(" ".join),
    min_size=2,
    max_size=5,
).flatmap(
    lambda uniq: st.lists(
        st.sampled_from(uniq), min_size=len(uniq), max_size=14
    )
)


@given(_dup_heavy_docs)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_staged_dedup_equals_unstaged_on_random_corpora(spark, texts):
    """Round-6 staged dedup: for ANY corpus (here: random word-salad drawn
    WITH replacement, so exact-dup cliques of random size are guaranteed),
    exact-collapse-then-near-dup must keep the identical survivor set as
    the single-stage pipeline — the equality the shared oracle relies on."""
    from checkatron_spark.operators.dedup import dedup_corpus, dedup_corpus_staged
    from checkatron_spark.session import release_scratch

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id int, text string"
    )
    kw = dict(n=2, threshold=0.6)
    want = sorted(
        r.doc_id for r in dedup_corpus(docs, "text", "doc_id", **kw).collect()
    )
    got = sorted(
        r.doc_id
        for r in dedup_corpus_staged(docs, "text", "doc_id", **kw).collect()
    )
    release_scratch()
    assert got == want


@st.composite
def _drift_plan(draw):
    """Random schema-drift scenario: shared value columns, before-only and
    after-only columns, random values with NULLs sprinkled in."""
    shared = draw(st.integers(0, 2))
    b_only = draw(st.integers(0, 2))
    a_only = draw(st.integers(0, 2))
    n_rows = draw(st.integers(1, 8))
    cells = st.one_of(st.none(), st.integers(0, 3))
    b_rows = draw(
        st.lists(
            st.tuples(*([cells] * (shared + b_only))),
            min_size=n_rows, max_size=n_rows,
        )
    )
    a_rows = draw(
        st.lists(
            st.tuples(*([cells] * (shared + a_only))),
            min_size=n_rows, max_size=n_rows,
        )
    )
    drop = draw(st.sets(st.integers(0, n_rows - 1), max_size=3))
    return shared, b_only, a_only, b_rows, a_rows, drop


@given(_drift_plan())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_schema_drift_diff_matches_generated_sql_oracle(spark, plan):
    """Core-diff fuzz under SCHEMA DRIFT (the reference's G1/P4 surface):
    random shared / before-only / after-only column universes with random
    NULL-y values, graded by running the ENGINE's DataFrame diff against
    the S7 SQL generator's output on DuckDB — the strongest parity claim
    the repo makes, now exercised on adversarial schemas instead of just
    the fixtures. Drifted columns must status 2/3 per the NULL-injection
    rule; every cell must agree across engines bit-for-bit."""
    import duckdb

    from checkatron_spark import diff
    from checkatron_spark.plans.sqlgen import render_diff_sql

    # fresh connection per hypothesis example (the function-scoped duck
    # fixture is shared across examples and would collide on table names)
    duck = duckdb.connect(":memory:")
    shared, b_only, a_only, b_rows, a_rows, drop = plan
    b_cols = ["k"] + [f"s{i}" for i in range(shared)] + [f"b{i}" for i in range(b_only)]
    a_cols = ["k"] + [f"s{i}" for i in range(shared)] + [f"a{i}" for i in range(a_only)]
    before_py = [(i, *r) for i, r in enumerate(b_rows)]
    after_py = [(i, *r) for i, r in enumerate(a_rows) if i not in drop]

    schema_b = ", ".join(f"{c} int" for c in b_cols)
    schema_a = ", ".join(f"{c} int" for c in a_cols)
    before = spark.createDataFrame(before_py, schema_b)
    after = spark.createDataFrame(after_py, schema_a)

    def nsort(rows):
        # status cells are None for matched _row_status — None-safe order
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    got_df = diff(before, after, ["k"])
    got = nsort(tuple(r) for r in got_df.collect())

    duck.sql(f"CREATE TABLE tb ({schema_b.replace(' int', ' INTEGER')})")
    duck.sql(f"CREATE TABLE ta ({schema_a.replace(' int', ' INTEGER')})")
    if before_py:
        duck.executemany(
            f"INSERT INTO tb VALUES ({','.join('?' * len(b_cols))})", before_py
        )
    if after_py:
        duck.executemany(
            f"INSERT INTO ta VALUES ({','.join('?' * len(a_cols))})", after_py
        )
    sql = render_diff_sql("tb", "ta", ["k"], b_cols, a_cols)
    res = duck.sql(sql)
    idx = [res.columns.index(c) for c in got_df.columns]
    want = nsort(tuple(row[i] for i in idx) for row in res.fetchall())
    assert got == want

    # drifted columns carry the NULL-injection statuses: a before-only
    # column is NULL on the after side -> status 3 unless both NULL (0);
    # after-only mirrors with 2 (on rows present in both)
    for r in got_df.collect():
        if r._row_status is not None:
            continue
        for i in range(b_only):
            assert r[f"B{i}"] in (0, 3)
        for i in range(a_only):
            assert r[f"A{i}"] in (0, 2)


@given(perturbations())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_faithful_plan_equals_rewrite_under_perturbation(spark, plan):
    """The reference-literal 3-op plan (key-UNION + two left joins) and the
    single full-outer rewrite must produce IDENTICAL rows on any
    perturbation — the equivalence the 1-shuffle optimization (J3) rests
    on, fuzzed instead of fixture-pinned (test_diff.py covers one case)."""
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

    def nsort(rows):
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    fast = diff(before, after, ["k"])
    faithful = diff(before, after, ["k"], faithful=True)
    assert fast.columns == faithful.columns
    assert nsort(map(tuple, fast.collect())) == nsort(
        map(tuple, faithful.collect())
    )


@st.composite
def _nullkey_tables(draw):
    """Random two-key tables where KEY columns themselves contain NULLs —
    the null-safe-join surface (J1/J2: <=> semantics) under adversarial
    data. Key pairs are drawn from a small domain so collisions and
    NULL-NULL matches actually occur; (k1,k2) is deduped per side because
    the diff contract assumes unique business keys per side."""
    keyspace = st.tuples(
        st.one_of(st.none(), st.integers(0, 2)),
        st.one_of(st.none(), st.integers(0, 2)),
    )
    cells = st.one_of(st.none(), st.integers(0, 2))
    b_keys = draw(st.lists(keyspace, min_size=1, max_size=8, unique=True))
    a_keys = draw(st.lists(keyspace, min_size=1, max_size=8, unique=True))
    b_rows = [(k1, k2, draw(cells)) for k1, k2 in b_keys]
    a_rows = [(k1, k2, draw(cells)) for k1, k2 in a_keys]
    return b_rows, a_rows


@given(_nullkey_tables())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_nullkey_multikey_diff_matches_generated_sql_oracle(spark, plan):
    """Multi-key diff with NULLs IN THE KEYS, graded against the S7 SQL
    generator on DuckDB: the null-safe join (<=> / IS NOT DISTINCT FROM)
    must pair NULL keys identically across engines, and the reference's
    first-key-NULL _row_status quirk must reproduce bit-for-bit (the
    default mode keeps the quirk; presence_fix is the documented fix)."""
    import duckdb

    from checkatron_spark import diff
    from checkatron_spark.plans.sqlgen import render_diff_sql

    duck = duckdb.connect(":memory:")
    b_rows, a_rows = plan
    before = spark.createDataFrame(b_rows, "k1 int, k2 int, v int")
    after = spark.createDataFrame(a_rows, "k1 int, k2 int, v int")

    got_df = diff(before, after, ["k1", "k2"])
    duck.sql("CREATE TABLE tb (k1 INTEGER, k2 INTEGER, v INTEGER)")
    duck.sql("CREATE TABLE ta (k1 INTEGER, k2 INTEGER, v INTEGER)")
    duck.executemany("INSERT INTO tb VALUES (?,?,?)", b_rows)
    duck.executemany("INSERT INTO ta VALUES (?,?,?)", a_rows)
    cols = ["k1", "k2", "v"]
    res = duck.sql(render_diff_sql("tb", "ta", ["k1", "k2"], cols, cols))

    def nsort(rows):
        return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))

    idx = [res.columns.index(c) for c in got_df.columns]
    got = nsort(tuple(r) for r in got_df.collect())
    want = nsort(tuple(row[i] for i in idx) for row in res.fetchall())
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(0, 40),                       # integer cents delta
            st.booleans(),                            # null out after?
        ),
        min_size=1, max_size=12,
    ),
    st.integers(1, 20),                               # tolerance in cents
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_tolerance_law(spark, deltas, tol_cents):
    """Tolerance-relaxed equality law fuzzed in integer cents. The operator
    compares RAW doubles (|b-a| <= tol, diff.py _equal_pred) — identical
    IEEE 754 arithmetic in Spark and the DuckDB oracle, which is why the
    declared tolerance query grades bit-exact. The law is therefore
    three-tiered: strictly inside the tolerance (d < tol) must be 0,
    strictly outside (d > tol) must be 1 — both provable, the float error
    ~1e-14 never bridges a full cent — and AT the boundary (d == tol) the
    status must equal the mirrored double computation (Python floats are
    the same IEEE doubles), where representation error legitimately
    decides: e.g. (4*100+3)/100.0 - 4.0 = 0.03000000000000025 > 0.03.
    NULL codes (2/3) must be UNAFFECTED by the tolerance flag."""
    from checkatron_spark import diff

    before = spark.createDataFrame(
        [(i, i * 100 / 100.0) for i in range(len(deltas))], ["k", "amt"]
    )
    after = spark.createDataFrame(
        [
            (i, None if nul else (i * 100 + d) / 100.0)
            for i, (d, nul) in enumerate(deltas)
        ],
        "k int, amt double",
    )
    tol = tol_cents / 100.0
    got = {
        r.K_K: r.AMT
        for r in diff(before, after, ["k"], tolerances={"amt": tol}).collect()
    }
    for i, (d, nul) in enumerate(deltas):
        if nul:
            assert got[i] == 3  # NULL in after only — tolerance irrelevant
        elif d < tol_cents:
            assert got[i] == 0, (i, d, tol_cents)
        elif d > tol_cents:
            assert got[i] == 1, (i, d, tol_cents)
        else:  # boundary: exactly the operator's double expression
            b_val = i * 100 / 100.0
            a_val = (i * 100 + d) / 100.0
            want = 0 if abs(a_val - b_val) <= tol else 1
            assert got[i] == want, (i, d, tol_cents, abs(a_val - b_val))


def test_tolerance_boundary_is_ieee_not_wishful(spark):
    """Regression for the shrunk hypothesis find: at k=4 a 3-cent delta
    with a 3-cent tolerance lands ON the boundary and the double difference
    (0.03000000000000025) exceeds tol — status 1, consistently in Spark,
    DuckDB, and Python. Pinned deterministically so the boundary behavior
    never depends on hypothesis' draw."""
    from checkatron_spark import diff

    before = spark.createDataFrame([(4, 4.0)], ["k", "amt"])
    after = spark.createDataFrame([(4, 4.03)], ["k", "amt"])
    got = diff(before, after, ["k"], tolerances={"amt": 0.03}).collect()[0]
    assert got.AMT == (0 if abs(4.03 - 4.0) <= 0.03 else 1) == 1


@given(_docs_strategy, _docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_contamination_frac_matches_python_mirror(spark, corpus, bench):
    """Graded contamination vs an independent python mirror: per-doc
    distinct-trigram overlap fraction against the union of the bench
    set's trigrams, including the whole-doc fallback under 3 words."""
    from checkatron_spark.selection import contamination_frac

    def grams(text):
        w = text.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    bench_grams = set().union(*(grams(t) for t in bench))
    cdf = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    bdf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(bench)], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in contamination_frac(cdf, bdf, "text", "doc_id").collect()
    }
    assert set(out) == set(range(len(corpus)))
    for i, t in enumerate(corpus):
        g = grams(t)
        matched = len(g & bench_grams)
        assert out[i]["n_grams"] == len(g)
        assert out[i]["n_matched"] == matched
        pct = round(100.0 * matched / len(g), 4)
        assert out[i]["pct_matched"] == pct
        want = "drop" if pct >= 70.0 else ("flag" if pct >= 20.0 else "clean")
        assert out[i]["verdict"] == want


@given(_docs_strategy)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_novelty_profile_matches_python_mirror(spark, texts):
    """First-seer novelty vs an independent python mirror over random
    corpora (shared grams, whole-doc fallbacks, 100%-novel singletons)."""
    from checkatron_spark.corpus import novelty_profile

    def grams(text):
        w = text.split(" ")
        if len(w) < 3:
            return {" ".join(w)}
        return {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}

    first = {}
    for i, t in enumerate(texts):
        for g in grams(t):
            first.setdefault(g, i)
    docs = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    out = {r["doc_id"]: r for r in novelty_profile(docs).collect()}
    assert set(out) == set(range(len(texts)))
    for i, t in enumerate(texts):
        g = grams(t)
        novel = sum(1 for x in g if first[x] == i)
        assert out[i]["n_grams"] == len(g)
        assert out[i]["n_novel"] == novel


@given(
    st.lists(st.sampled_from(_WORDS), min_size=2, max_size=6),
    st.integers(1, 5),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bm25_tf_monotonicity(spark, filler, reps):
    """BM25 invariant: with one query term and equal doc lengths, the doc
    with MORE term occurrences never ranks below the doc with fewer."""
    from checkatron_spark.selection import bm25_topk

    pad = " ".join(filler)
    hi = " ".join(["join"] * (reps + 1)) + " " + pad
    lo = " ".join(["join"] * reps) + " x " + pad  # same token count
    docs = spark.createDataFrame([(1, hi), (2, lo)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bm25_topk(docs, ("join",), k=5).collect()}
    assert out[1]["score_micro"] > out[2]["score_micro"]
    assert out[1]["rnk"] < out[2]["rnk"]
