"""Closure-level staleness (round 9, VERDICT r8 #3 follow-through): the
cross-module fingerprint in __spark_entry__ must (a) IGNORE edits that
provably cannot touch a query — that is the whole point, a 3000-line
module's unrelated churn must not flood the 50-slot driver window — and
(b) CHANGE (or refuse with None) for every edit class that could: the
query's function, a transitively-referenced helper in any repo module,
import rebinding, loose module-level statements, decorators, the query's
own registration/oracle entry. Conservative direction is pinned hard:
every unsound shape must yield None, never a false "fresh"."""

from __future__ import annotations

import __spark_entry__ as entrymod

CORPUS = "checkatron_spark/corpus.py"


def _disk(path):
    import os

    here = os.path.dirname(os.path.abspath(entrymod.__file__))
    try:
        with open(os.path.join(here, path)) as fh:
            return fh.read()
    except OSError:
        return None


def _patched(path_to_patch, transform):
    def src_of(path):
        s = _disk(path)
        if s is not None and path == path_to_patch:
            return transform(s)
        return s

    return src_of


def _fp_full(src_of):
    return entrymod._query_fingerprint(
        CORPUS, "q_pmi_collocations", "pmi_collocations", src_of
    )


def _fp(src_of):
    res = _fp_full(src_of)
    return None if res is None else res[0]


BASE = None


def setup_module():
    global BASE
    BASE = _fp(_disk)
    assert BASE is not None


def test_unrelated_same_module_edit_keeps_fingerprint():
    # a brand-new function appended to the 1400-line module
    fp = _fp(_patched(CORPUS, lambda s: s + "\n\ndef _r9_unrelated():\n    return 1\n"))
    assert fp == BASE
    # an edit INSIDE another query's function body
    assert "def q_chunk_documents" in _disk(CORPUS)
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                "def q_chunk_documents", "def q_chunk_documents_renamed"
            ),
        )
    )
    # renaming another query's function removes it from defs — the
    # pmi closure never referenced it, so the fingerprint holds
    assert fp == BASE


def test_own_function_edit_changes_fingerprint():
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                "def pmi_collocations(", "def pmi_collocations(  # edited"
            ),
        )
    )
    assert fp != BASE


def test_oracle_constant_edit_changes_fingerprint():
    src = _disk(CORPUS)
    assert "PMI_COLLOCATIONS_SQL" in src
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                "PMI_COLLOCATIONS_SQL = r", "PMI_COLLOCATIONS_SQL = r'-- x' + r",
            ),
        )
    )
    assert fp != BASE


def test_import_and_loose_statement_edits_change_fingerprint():
    # a NEW import (could rebind a name used anywhere)
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                "from __future__ import annotations",
                "from __future__ import annotations\nimport os as _r9_os",
                1,
            ),
        )
    )
    assert fp != BASE
    # a loose module-level statement (registration/config side effects)
    fp = _fp(_patched(CORPUS, lambda s: s + "\nif True:\n    pass\n"))
    assert fp != BASE
    # a pure comment appended to a line does NOT flip (comments are not
    # behavior; AST segments exclude them)
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                "from __future__ import annotations",
                "from __future__ import annotations  # note",
                1,
            ),
        )
    )
    assert fp == BASE


def test_cross_module_helper_edit_changes_fingerprint():
    # pmi_collocations pulls scratch_persist from session.py inside its
    # body — an edit THERE must flip the fingerprint even though the
    # defining module is untouched
    sess = "checkatron_spark/session.py"
    assert "def scratch_persist" in _disk(sess)
    fp = _fp(
        _patched(
            sess,
            lambda s: s.replace(
                "def scratch_persist", "def scratch_persist(  # edited", 1
            ).replace("def scratch_persist(  # edited(", "def scratch_persist(  # edited\n _bad", 0),
        )
    )
    assert fp != BASE


def test_other_querys_oracle_entry_is_ignored():
    # append a NEW key to the oracles() return dict -> per-entry capture
    # must keep pmi fresh (count the dict edit only for the new query)
    src = _disk(CORPUS)
    anchor = '"pmi_collocations": PMI_COLLOCATIONS_SQL,'
    assert anchor in src
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                anchor, anchor + ' "r9_new_q": PMI_COLLOCATIONS_SQL,'
            ),
        )
    )
    assert fp == BASE


def test_unsound_shapes_yield_none_not_fresh():
    # repo star import
    fp = _fp(
        _patched(
            CORPUS,
            lambda s: s.replace(
                "from __future__ import annotations",
                "from __future__ import annotations\n"
                "from checkatron_spark.sampling import *",
                1,
            ),
        )
    )
    assert fp is None
    # missing function
    fp = entrymod._query_fingerprint(
        CORPUS, "no_such_function", "pmi_collocations", _disk
    )
    assert fp is None
    # unreadable module
    fp = _fp(lambda path: None if path == CORPUS else _disk(path))
    assert fp is None


def test_decorator_text_is_fingerprinted():
    # neardup_minhash_banded's pandas_udf schema string lives in a
    # decorator — INSIDE the function here, but module-level decorated
    # defs exist too; pin via a synthetic check on _sym_seg including
    # decorators for a real decorated module-level function
    import ast

    src = "@x\ndef f():\n    return 1\n"
    info = entrymod._parse_module_info(src)
    assert info is not None
    seg = entrymod._sym_seg(info, "f")
    assert seg.startswith("@x")


def test_fingerprint_is_deterministic():
    assert _fp(_disk) == BASE
    assert _fp(_disk) == BASE


def test_reach_includes_transitive_modules():
    """Review r9 finding #1: the fingerprint's reached-file set is the
    staleness TRIGGER, and it must include modules the one-hop import
    gate cannot see — e.g. diff_orders reaches operators/diff.py through
    the package __init__ re-export."""
    res = entrymod._query_fingerprint(
        "__spark_entry__.py", "_q_diff_orders", "diff_orders", _disk
    )
    assert res is not None
    _, reached = res
    assert "checkatron_spark/operators/diff.py" in reached
    one_hop = entrymod._query_source_files(
        entrymod._queries_unordered()["diff_orders"]
    )
    assert "checkatron_spark/operators/diff.py" not in one_hop  # the gap


def test_import_rebind_by_module_def_is_ambiguous():
    """Review r9 finding #2: a module-level assignment that rebinds an
    import-alias name makes the name unsound — the fingerprint must be
    None, never a false fresh."""
    src = (
        "import checkatron_spark.corpus as helper\n"
        "helper = 1\n\n"
        "def f():\n    return helper\n"
    )
    info = entrymod._parse_module_info(src)
    assert info is not None
    assert "helper" in info["ambiguous"]
    assert entrymod._node_refs(info, info["defs"]["f"]) is None


def test_preamble_reorder_changes_fingerprint():
    """Review r9 finding #3: loose module-level statements are
    order-dependent (CONF.update chains) — swapping them must flip the
    fingerprint, not vanish in a sorted() normalization."""
    s1 = "C = {}\n\ndef f():\n    return C\n\nC.update({'a': 1})\nC.update({'a': 2})\n"
    s2 = "C = {}\n\ndef f():\n    return C\n\nC.update({'a': 2})\nC.update({'a': 1})\n"
    r1 = entrymod._query_fingerprint("m.py", "f", "none", lambda p: s1)
    r2 = entrymod._query_fingerprint("m.py", "f", "none", lambda p: s2)
    assert r1 is not None and r2 is not None
    assert r1[0] != r2[0]


def test_spread_registration_is_followed_or_refused():
    """Review r9 finding #7: **spread entries in a registration dict are
    either resolved into the spread module's maps or the fingerprint is
    None — never silently skipped."""
    # resolvable spread over a repo module: entry-module queries keep
    # working (the real _queries_unordered uses **P.QUERIES spreads)
    res = entrymod._query_fingerprint(
        "__spark_entry__.py", "_q_keys_union", "keys_union", _disk
    )
    assert res is not None
    # unresolvable spread shape -> None
    src = (
        "def q(spark, sf):\n    return None\n\n"
        "def mystery():\n    return {}\n\n"
        "QUERIES = {'q': q, **mystery()}\n"
    )
    assert entrymod._query_fingerprint("m.py", "q", "q", lambda p: src) is None


def test_reassigned_module_name_keeps_every_assignment():
    """`X = 1 ... X = 2` — editing the EARLIER assignment must still flip
    the fingerprint (only tracking the last segment would lose it)."""
    src1 = "X = 1\nX = 2\n\ndef f():\n    return X\n"
    src2 = "X = 7\nX = 2\n\ndef f():\n    return X\n"
    i1 = entrymod._parse_module_info(src1)
    i2 = entrymod._parse_module_info(src2)
    assert entrymod._sym_seg(i1, "X") != entrymod._sym_seg(i2, "X")


def test_mutable_global_pulls_in_co_writers():
    """A dict cache read by f and written by g: editing g must flip f's
    closure even though f never calls g (shared-mutable-state coupling);
    a STRING constant must NOT drag its other consumers in."""
    src = (
        "CACHE = {}\nSQL = 'select 1'\n\n"
        "def f():\n    return CACHE.get(1), SQL\n\n"
        "def g():\n    CACHE[1] = 2\n\n"
        "def h():\n    return SQL\n"
    )
    info = entrymod._parse_module_info(src)
    local, ext = entrymod._sym_refs(info, "f")
    assert "CACHE" in local and "SQL" in local
    cache_local, _ = entrymod._sym_refs(info, "CACHE")
    assert {"f", "g"} <= cache_local  # co-writers joined
    sql_local, _ = entrymod._sym_refs(info, "SQL")
    # immutable constant: consumers NOT joined (only the harmless
    # self-reference from the assignment target's own Name node)
    assert sql_local <= {"SQL"}
    assert "f" not in sql_local and "h" not in sql_local
