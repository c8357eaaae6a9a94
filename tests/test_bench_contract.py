"""Bench measurement discipline (VERDICT r12 #6): round 12 produced the
first cross-round-comparable bench — quiet-gated start load and a
per-query delta table vs the previous round's min+spread. These gates
keep that discipline from regressing silently: the committed
BENCH_DETAIL.json must carry the load stamps, must have STARTED quiet
(or honestly carry loaded=true, which the judge reads as
non-comparable), and must include the delta table."""

from __future__ import annotations

import json
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _detail() -> dict:
    p = REPO / "BENCH_DETAIL.json"
    assert p.exists(), "no BENCH_DETAIL.json committed — run python bench.py"
    return json.loads(p.read_text())


def test_bench_detail_started_quiet_or_flagged():
    import bench

    d = _detail()
    assert "load_start" in d and "loaded" in d, (
        "BENCH_DETAIL.json lacks the load stamps — the quiet-gate bench "
        "(bench.py _wait_for_quiet) must have written this file"
    )
    load1 = d["load_start"][0]
    if d["loaded"]:
        # an honestly-flagged loaded run is allowed on disk mid-round,
        # but it must actually be over the threshold (the flag may not
        # be planted to excuse a quiet-looking regression)
        assert load1 > bench.LOAD1_QUIET_MAX
    else:
        assert load1 <= bench.LOAD1_QUIET_MAX, (
            f"BENCH_DETAIL.json claims a quiet start (loaded=false) but "
            f"load1={load1} > {bench.LOAD1_QUIET_MAX}"
        )


def test_bench_detail_has_delta_table_and_headline_coverage():
    import bench

    d = _detail()
    assert isinstance(d.get("delta_vs_prev"), dict), (
        "BENCH_DETAIL.json lacks the per-query delta_vs_prev table — "
        "regressions vs the previous round must be machine-flagged"
    )
    assert isinstance(d.get("queries"), dict) and d["queries"], (
        "BENCH_DETAIL.json lacks per-query timings"
    )
    # every CURRENT headline query must appear in the committed detail —
    # adding a headline row without re-running bench turns this red
    # until bench re-runs, which is the point (same rule as the sweep
    # coverage gate)
    missing = [n for n in bench.HEADLINE if n not in d["queries"]]
    assert not missing, (
        f"BENCH_DETAIL.json missing headline queries {missing} — "
        "re-run: python bench.py"
    )


def test_bench_detail_entries_carry_median_and_runs():
    """VERDICT r14 #6: the regression-aware escalation only grants extra
    runs to would-be regressions, and extra runs can only LOWER a min —
    a mild systematic bias against recording regressions. The median over
    every run taken is the noise-robust second signal that keeps that
    asymmetry visible; every committed detail entry must carry it."""
    d = _detail()
    for q, e in d["queries"].items():
        assert {"min", "median", "runs"} <= set(e), (
            f"{q}: detail entry lacks min/median/runs — re-run bench.py"
        )
        assert e["median"] >= e["min"] - 1e-9, f"{q}: median below min"
        assert e["min"] == min(e["runs"]), f"{q}: min not min(runs)"


def test_bench_detail_has_coldfit_rows():
    """VERDICT r14 #2: ANN models persist to disk keyed on corpus
    identity, so warm bench rows never pay fit cost. The cold-fit rows
    (caches cleared inside the timed region) make that cost a committed
    number; they are out-of-total like wide_diff, and dropping them would
    silently re-hide fit regressions."""
    import bench

    d = _detail()
    for cold_name, warm_name in bench.COLDFIT:
        e = d["queries"].get(cold_name)
        assert e is not None, (
            f"BENCH_DETAIL.json lacks cold-fit row {cold_name} — "
            "re-run: python bench.py"
        )
        assert e.get("in_total") is False, (
            f"{cold_name} must stay out of the headline total"
        )
        w = d["queries"].get(warm_name)
        assert w is not None, f"warm twin {warm_name} missing"


def test_escalation_fires_on_r13_diff_orders_triple():
    """VERDICT r13 #6: the exact triple that exposed the escalation hole.
    Runs [2.071, 1.321, 1.205] with prev committed min 0.73 must escalate
    — the noise trigger correctly stays quiet (runs 2-3 agree within 20%)
    but the regression trigger must fire, because recording 1.205 against
    a 0.73 baseline flags a regression that was never re-measured."""
    import bench

    runs = [2.071, 1.321, 1.205]
    prev = {"min": 0.73, "spread": 0.062}
    assert not bench._needs_noise_escalation(runs)
    assert bench._needs_regression_escalation(min(runs), prev)
    assert bench.REGRESSION_EXTRA_RUNS >= 2  # min-of-5 when it fires


def test_escalation_triggers_stay_quiet_on_settled_runs():
    import bench

    # settled triple at parity with the previous round: neither fires
    runs = [1.31, 1.02, 1.05]
    prev = {"min": 1.0, "spread": 0.1}
    assert not bench._needs_noise_escalation(runs)
    assert not bench._needs_regression_escalation(min(runs), prev)
    # genuinely faster round: no regression escalation either
    assert not bench._needs_regression_escalation(0.6, prev)
    # no baseline (new query): regression trigger cannot fire
    assert not bench._needs_regression_escalation(9.9, None)
    # post-warm disagreement >20% of min: noise trigger fires
    assert bench._needs_noise_escalation([1.1, 1.0, 1.3])
