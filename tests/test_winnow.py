"""Winnowing exact-substring dedup: positive/negative guarantees on crafted
strings (the fixture corpus only proves the realistic path), the density
bound, and the hot-fingerprint skew guard."""

from __future__ import annotations

import random
import string

from checkatron_spark.operators.dedup import substring_dup_pairs


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _rand(n, seed):
    rng = random.Random(seed)
    return "".join(rng.choice(string.ascii_lowercase + " ") for _ in range(n))


def test_guaranteed_detection_above_k_plus_w(spark):
    # two otherwise-random docs sharing one verbatim run of k + w - 1 = 49
    # chars: the winnowing guarantee says at least one shared fingerprint
    shared = _rand(49, seed=7)
    rows = [
        (1, _rand(120, seed=1) + shared + _rand(120, seed=2)),
        (2, _rand(120, seed=3) + shared + _rand(120, seed=4)),
        (3, _rand(300, seed=5)),  # bystander
    ]
    out = substring_dup_pairs(_docs(spark, rows), "text", "doc_id", k=40, w=10)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_no_pairs_without_shared_substring(spark):
    rows = [(i, _rand(300, seed=100 + i)) for i in range(6)]
    out = substring_dup_pairs(_docs(spark, rows), "text", "doc_id", k=40, w=10)
    assert out.count() == 0


def test_short_and_empty_docs_yield_no_fingerprints(spark):
    rows = [(1, ""), (2, "short"), (3, "x" * 39), (4, None)]
    out = substring_dup_pairs(_docs(spark, rows), "text", "doc_id", k=40, w=10)
    assert out.count() == 0


def test_identical_docs_share_all_fingerprints(spark):
    text = _rand(300, seed=42)
    out = substring_dup_pairs(
        _docs(spark, [(1, text), (2, text)]), "text", "doc_id", k=40, w=10
    ).collect()
    assert len(out) == 1
    r = out[0]
    # density bound: winnowing selects ~ng/w distinct mins; identical docs
    # share every one, and there must be at least ceil(ng/w) of them
    ng = len(text) - 40 + 1
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.n_shared_fps >= ng // 10


def test_max_fp_freq_drops_boilerplate(spark):
    # the same 49-char boilerplate in EVERY doc -> its fingerprints hit all
    # 5 docs; capping fp frequency below that removes the all-pairs clique
    shared = _rand(49, seed=9)
    rows = [(i, _rand(100, seed=200 + i) + shared) for i in range(5)]
    dense = substring_dup_pairs(_docs(spark, rows), "text", "doc_id", k=40, w=10)
    assert dense.count() == 10  # 5 choose 2
    capped = substring_dup_pairs(
        _docs(spark, rows), "text", "doc_id", k=40, w=10, max_fp_freq=3
    )
    assert capped.count() == 0


# ---------------------------------------------------------------------------
# property tests vs a pure-python mirror (same recipe as tests/
# test_properties.py: hypothesis generates corpora, the mirror recomputes
# the exact expected pair set)
# ---------------------------------------------------------------------------

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _mirror_fps(s: str, k: int, w: int) -> set[int]:
    ng = len(s) - k + 1
    if ng <= 0:
        return set()
    h = [
        int(hashlib.md5(s[i : i + k].encode("utf-8")).hexdigest()[:15], 16)
        for i in range(ng)
    ]
    return {min(h[p : p + w]) for p in range(max(ng - w, 0) + 1)}


@st.composite
def corpora(draw):
    alphabet = "ab "  # tiny alphabet -> real collisions/overlaps happen
    n_docs = draw(st.integers(2, 5))
    return [
        (i, draw(st.text(alphabet=alphabet, min_size=0, max_size=40)))
        for i in range(n_docs)
    ]


@given(corpora())
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_pairs_match_python_mirror(spark, docs):
    k, w = 8, 3
    expected = {}
    fps = {i: _mirror_fps(t, k, w) for i, t in docs}
    for i, _ in docs:
        for j, _ in docs:
            if i < j and fps[i] & fps[j]:
                expected[(i, j)] = len(fps[i] & fps[j])
    out = substring_dup_pairs(
        _docs(spark, docs), "text", "doc_id", k=k, w=w
    ).collect()
    got = {(r.id_a, r.id_b): r.n_shared_fps for r in out}
    assert got == expected


def test_detection_boundary_is_exactly_k_plus_w_minus_1(spark):
    """VERDICT r6 item 7: the guarantee is SHARP. A shared verbatim run of
    k+w-1 chars is always detected (w consecutive shared k-grams => some
    selection window falls entirely inside the run); at k+w-2 only w-1
    shared grams exist, every window straddles differing context, and
    detection depends on hash order — a real miss, pinned with a found
    fixture (seed 27: python-simulated winnowing shares zero
    fingerprints). Property side: ten seeds at k+w-1 all detect."""
    k, w = 40, 10
    rows = []
    for s in range(10):
        shared = _rand(k + w - 1, seed=1000 + s)
        rows += [
            (10 * s, _rand(120, seed=2000 + s) + shared + _rand(120, seed=3000 + s)),
            (10 * s + 1, _rand(120, seed=4000 + s) + shared + _rand(120, seed=5000 + s)),
        ]
    out = substring_dup_pairs(_docs(spark, rows), "text", "doc_id", k=k, w=w)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    for s in range(10):
        assert (10 * s, 10 * s + 1) in got, f"k+w-1 guarantee broken, seed {s}"

    # one char shorter: the found-miss fixture must emit NO pair
    s = 27
    shared = _rand(k + w - 2, seed=1000 + s)
    rows2 = [
        (1, _rand(120, seed=2000 + s) + shared + _rand(120, seed=3000 + s)),
        (2, _rand(120, seed=4000 + s) + shared + _rand(120, seed=5000 + s)),
    ]
    out2 = substring_dup_pairs(_docs(spark, rows2), "text", "doc_id", k=k, w=w)
    assert out2.collect() == []


def test_fps_non_ascii_matches_mirror(spark):
    """Round 12: the vectorized kernel byte-slices an encode-once buffer on
    the ASCII fast path and falls back to char slicing otherwise — a
    multibyte doc must hash the SAME byte sequences as the r11 per-gram
    encode (an off-by-bytes slice would silently change every fingerprint
    of every non-English document)."""
    k, w = 8, 3
    rows = [
        (1, "héllo wörld déjà vu " * 4),
        (2, "naïve héllo wörld déjà vu approach " * 3),
        (3, "日本語のテキストで重複検出を試す" * 3),
        (4, "mixed ascii with 中文 inside " * 4),
    ]
    fps = {i: _mirror_fps(t, k, w) for i, t in rows}
    expected = {
        (i, j): len(fps[i] & fps[j])
        for i, _ in rows
        for j, _ in rows
        if i < j and fps[i] & fps[j]
    }
    assert expected  # the fixture genuinely shares fingerprints
    out = substring_dup_pairs(
        _docs(spark, rows), "text", "doc_id", k=k, w=w
    ).collect()
    assert {(r.id_a, r.id_b): r.n_shared_fps for r in out} == expected


def test_rolling_and_winnow_hash_match_per_char_fold(spark):
    """Round 12 (VERDICT r11 #3): the numpy prefix-table kernels in
    functions/text.py must equal the classic per-char rolling folds
    bit-for-bit — same polynomial, same Mersenne mod — on empty/short/
    unicode/long adversarial inputs (the DuckDB oracles fold per char, so
    any divergence is a cross-engine red)."""
    from pyspark.sql import functions as F

    from checkatron_spark.functions.text import (
        ROLL_BASE,
        ROLL_MOD,
        rolling_hash,
        winnow_min_hash,
    )

    def fold(s):
        acc = 0
        for ch in s:
            acc = (acc * ROLL_BASE + ord(ch)) % ROLL_MOD
        return acc

    def wmh_ref(s, k=16):
        if len(s) < k:
            return fold(s)
        pk = pow(ROLL_BASE, k - 1, ROLL_MOD)
        h = fold(s[:k])
        best = h
        for i in range(1, len(s) - k + 1):
            h = ((h - ord(s[i - 1]) * pk) * ROLL_BASE + ord(s[i + k - 1])) \
                % ROLL_MOD
            best = min(best, h)
        return best

    rng = random.Random(12)
    texts = [
        "", "a", "exactly fifteen.", "sixteen chars ab",
        "日本語テキスト and ascii mixed 🚀 content here",
        "x" * 2500,
        None,
    ] + [
        "".join(
            chr(rng.randrange(1, 0x3000 if rng.random() < 0.2 else 127))
            for _ in range(rng.randrange(0, 300))
        )
        for _ in range(25)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["i", "t"]
    )
    got = {
        r["i"]: (r["rh"], r["wm"])
        for r in df.select(
            "i",
            rolling_hash(F.col("t")).alias("rh"),
            winnow_min_hash(F.col("t"), k=16).alias("wm"),
        ).collect()
    }
    for i, t in enumerate(texts):
        s = t or ""
        assert got[i] == (fold(s), wmh_ref(s)), (i, repr(s[:40]))
