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
