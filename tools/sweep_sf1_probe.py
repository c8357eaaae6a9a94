"""10x-scale timing probe: time the most expensive operators at 10x the
bench scale and report per-query growth vs the small scale.

sf0.1 is ~600k lineitem rows / 5k docs — nonlinear blowups (candidate
explosion in LSH bands, window spills, driver collects that secretly
scale with data) can hide below that. This probe runs each operator once
warm at BOTH scales in one session and prints the big/small ratio next
to the 10x data growth, plus the OUTPUT ROW ratio, so growth is
interpretable mechanically: an operator whose runtime grows no faster
than max(data growth, output growth) is scale-clean.

Two fixture families (VERDICT r6 item 1):

- ``--docs``: documents-table operators against the REALISTIC-duplication
  corpora from tools/gen_sf_realistic_docs.py (default /tmp/sfreal01 vs
  /tmp/sfreal1 — 5k vs 50k docs at the same 10% dup rate, cluster sizes
  2-5, token-level perturbations). Because the dup rate is
  scale-invariant, pair counts grow ~linearly and a super-linear flag is
  a real finding, not a clique artifact. The old tiled probe manufactured
  ~10-member near-dup cliques (971x pair growth) here.
- default / ``--batch2``: everything else (diff, TPC-H, events, streams,
  embeddings) against the key-shifted tiled set from
  tools/gen_sf_probe.py — correct for non-pair operators, where tiling
  preserves exactly the marginals that matter.

Correctness stays graded at sf0.01/sf0.1 (the driver's gate); this is
timing/growth only. TESTDATA dirs are read-only, so probe sets live in
scratch.

Machine-readable output (round 9, VERDICT r8 #7): alongside the text
report, every probed query appends one JSON line to ``--json PATH``
(query, timings, ratios, bound, ok, allowed) so the scale gate is
mechanical — ``test_latest_sf1_probe_is_scale_clean`` fails the suite if
the newest committed probe misses a battery query or contains a
non-allow-listed SUPER-LINEAR row. Batch 1 truncates the file; --batch2 /
--docs append, so the documented 3-command sequence yields one complete
file per round.

Usage:
  python tools/gen_sf_probe.py /tmp/sfprobe1 10
  python tools/gen_sf_realistic_docs.py /tmp/sfreal01 5000
  python tools/gen_sf_realistic_docs.py /tmp/sfreal1 50000
  { python tools/sweep_sf1_probe.py /tmp/sfprobe1 --json SWEEP_r<N>_sf1.json &&
    python tools/sweep_sf1_probe.py /tmp/sfprobe1 --batch2 --json SWEEP_r<N>_sf1.json &&
    python tools/sweep_sf1_probe.py --docs --json SWEEP_r<N>_sf1.json ; } \
    > SWEEP_r<N>_sf1.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from checkatron_spark.session import get_spark, release_scratch  # noqa: E402

SF01 = "/root/testdata/sf0.1"
REAL_SMALL = "/tmp/sfreal01"
REAL_BIG = "/tmp/sfreal1"

# Below this small-side wall-clock the overhead-adjusted ratio divides by
# its 0.1 s floor and measures scheduling noise, not growth — rows that
# pass on the RAW ratio report adj_ratio null("sub-floor") instead of an
# alarming number (VERDICT r10 #5; pinned in tests/test_entry_contract.py)
ADJ_FLOOR = 0.5


def classify(ratio: float, adj: float, bound: float, t_small: float):
    """The probe's growth verdict, self-explaining (VERDICT r10 #5):
    returns (ok, ok_via, adj_out). ok stays the documented OR — raw OR
    overhead-adjusted ratio inside the bound — but ok_via names which
    criterion carried the row, and a raw-pass row whose small side sits
    under ADJ_FLOOR reports adj_out None: under the floor the adjustment
    divides by its 0.1 s denominator floor and the number is noise that
    reads like a violation inside a green row. When adj is the carrying
    criterion it is always reported (it is the row's justification)."""
    ok = ratio <= bound or adj <= bound
    ok_via = "raw" if ratio <= bound else ("adj" if adj <= bound else None)
    adj_out = None if (t_small < ADJ_FLOOR and ok_via == "raw") \
        else round(adj, 2)
    return ok, ok_via, adj_out

# tiled-fixture batch 1: streams, embeddings, non-doc heavies
PROBE = [
    "stream_patch_apply",
    "stream_ivm_totals",
    # round 8: streaming join-view maintenance — growth should track the
    # changefeed (the store folds churn, not the snapshot)
    "stream_ivm_join",
    "ann_ivf_topk",
    "ann_lsh_topk",
    # round 8: filtered ANN — the block-equality join should grow with
    # block population (10x here: same label count, 10x members)
    "ann_label_filtered_topk",
    "kmeans_domains",
    # round 10 (late batch): SemDeDup — within-cluster pair work is
    # sum(|cluster|^2), so 10x rows at fixed k=8 grows the pair stage
    # ~100x/k... in practice bounded by the kmeans + join constants at
    # this scale; at 100 TB the lever is k ∝ corpus (see SCALE.md)
    "semdedup_prune",
    # round 12: PQ ADC — fit is m fixed-size Lloyd loops (collect ∝ m*k*
    # sub ints), encode one kernel pass ∝ corpus, search ∝ corpus codes x
    # matching queries; growth should track the scan term
    "ann_pq_adc_topk",
    # round 12 late batch: the refine stage adds |Q|*shortlist exact
    # folds on top of ADC (corpus-size independent); Hamming is the
    # cheapest per-pair scan in the repo — growth tracks |Q| x corpus
    # with a ~2-ALU-op pair cost
    "ann_pq_rerank_topk",
    "ann_hamming_topk",
    # composed IVF-PQ: coarse+residual fits are fixed-size Lloyd loops,
    # encode/search ∝ corpus (probed fraction) — growth = the scan term
    "ann_ivfpq_topk",
    # round 14: the approximate audit twins. Grid-IVF = cached coarse
    # fit + zero-shuffle assignment kernel + probed-cell scoring (growth
    # ∝ probed-cell population); banded LSH = band-equality candidate
    # join — candidate volume ∝ bucket occupancy, the measured quantity
    # (5-bit bands over clustered embeddings; a uniform corpus would
    # degrade toward the brute scan, which is exactly what this row
    # exists to catch at 10x)
    "ann_ivf_grid_topk",
    "ann_lsh_banded_topk",
    # round 14: incremental admission — fit + base index load from the
    # caches, so measured growth is batch assignment + tombstone
    # anti-join + the probed search (the update term is ∝ batch; the
    # search term is the same probed-cell shape as ann_ivf_grid_topk)
    "ann_ivf_incremental",
]

# tiled-fixture batch 2: flagship diff + TPC-H/window/events shapes
# (needs the full tiled table set)
PROBE2 = [
    "diff_orders",
    "diff_lineitem_multikey",
    "q21_sole_late_supplier",
    "q9_product_profit",
    "events_sessionize",
    "trailing_30d_revenue",
    # round 7: global ordinal assignment — the point is that the bounded
    # per-bucket windows keep growth ~linear where the naive global
    # window would funnel 10x the data through one task
    "assign_doc_ids",
    # round 7: rollup reuse — the coarse layer re-aggregates O(days)
    # partials, so growth tracks the raw-scan term only
    "rollup_from_partials",
    # round 8: join-view IVM — kept/churn passes are all ∝ view or churn
    "ivm_join_enriched",
    # round 8: mergeable binned quantiles — bin count is scale-invariant,
    # so growth is the raw-scan term only (like rollup_from_partials)
    "price_quantiles_from_partials",
    # round 8: takedown cascade — one codegen aggregate + one broadcast
    # join on the removed-id projection
    "takedown_propagation",
    # round 8: one bounded user_id window + map-combined session aggregate
    "events_session_stats",
    # round 8: binned interval-overlap join — growth ∝ overlap density
    "sessions_overlap_promos",
    # round 8: posexplode→(label, dim) groupBys; 64 rows per vector
    "embedding_drift",
    # round 10 (late batch): BM25 — tiled fixture keeps the testdata
    # vocabulary, so the posting filter actually selects; growth tracks
    # matching-posting volume, never the corpus
    "bm25_topk",
    # round 11: multi-profile BM25 — same posting discipline, growth
    # tracks matching postings x profile fan-out, never the corpus
    "bm25_multiquery",
]

# realistic-duplication batch: every pair/cluster/corpus-shaped operator
# over the documents table — the family the tiled cliques distorted
PROBE_DOCS = [
    "dedup_corpus_e2e",
    "dedup_corpus_staged",
    "neardup_clusters",
    "split_by_cluster",
    "neardup_ngram_jaccard",
    "neardup_minhash_lsh",
    "neardup_minhash_banded",
    "substring_dup_pairs",
    "dedup_spans_keep_first",
    "strip_boilerplate",
    "curation_funnel",
    "tfidf_top_terms",
    "decontaminate_bloom",
    "dedup_exact",
    # round 8: collocation mining (two corpus count passes + Zipf-floored
    # pair join) and keep-list re-election (labels-only semi join + min)
    "pmi_collocations",
    "dedup_reelect_after_takedown",
    # round 8: graph-shape audit — work ∝ sum(deg²) over the pair set
    "neardup_triangles",
    # round 10 (late batch): selection module — graded contamination
    # (broadcast gram join) and DSIR hashed-bigram weights (B-row bucket
    # aggregate + broadcast log-ratio join); both grow ~linearly in
    # corpus gram volume. (bm25_topk probes in PROBE2: its fixed query
    # terms live in the TESTDATA vocabulary — on this batch's synthetic
    # Zipf tokens the posting filter matches nothing and the probe row
    # would be vacuous.)
    "contamination_frac",
    "dsir_importance",
    # round 10 (late batch 2): first-seer novelty — the dup_ngram_profile
    # shuffle shape, growth ∝ gram volume; CCNet buckets — the
    # lm_bigram_coverage join + a |langs|-row sketch pass
    "novelty_profile",
    "ccnet_ppl_buckets",
    # round 11: canonical-key stage-0 dedup — one (source, fp) groupBy +
    # semi join; growth is the scan term (the realistic fixture's dups
    # are token-level perturbations, so the collapse itself is ~empty
    # and the row measures pure stage cost)
    "dedup_canonical",
    # round 12: REAL media decode — per-doc encode+decode through the
    # stdlib codecs, pure map work, growth = the scan term; and greedy-
    # subword counting — growth tracks token volume + the (sub-linear,
    # zipf) distinct-word table
    "media_decode",
    "token_count_bpe",
    # round 13: stdlib WAV decode — per-doc encode+decode through the
    # wave reader, pure map work like media_decode, growth = the scan
    # term. (ann_recall_audit is NOT probed: it is a composition of five
    # already-probed/documented searches plus the brute-force truth term,
    # whose |Q| x corpus growth is the documented blocked-twin exception
    # — see q_ann_recall_audit's docstring.)
    "media_decode_wav",
    # round 13: BPE merge learning — ONE corpus word-count pass + merge
    # rounds on the bounded top-500 head vocabulary; growth = the scan
    # term (the realistic fixture's richer vocabulary exercises the cap)
    "bpe_train_segment",
    # round 14: unicode profile — replace chain + per-class
    # regexp_replace+length folds in one zero-shuffle aggregate; growth
    # = the scan term exactly
    "unicode_profile",
]


# Known probe rows whose growth legitimately exceeds the mechanical bound,
# with the reason the judge should read. An ALLOW row is NOT a free pass on
# regression: the reason documents the growth LAW (e.g. output-bound), and
# removing the cause retires the entry.
ALLOW: dict[str, str] = {
    # (decontaminate_bloom retired round 10 — once the per-(benchmark,
    # params) mask memo landed, the probe's min-of-2 pays the mask build
    # on run 1 only, so the measured row is scan-growth and sits inside
    # the mechanical bound on its own; r9: t_ratio 8.39 vs bound 12.55)
    #
    # (semdedup_prune carried an allow for one commit: its pair stage is
    # sum(|cluster|^2) at FIXED k=8, so 10x rows is ~12.5x pair work by
    # design, and the interpreted higher-order fold measured 11-14x.
    # Retired the same round by the Arrow pair kernel — the per-dimension
    # sequential-fold numpy path cut the constant ~3.5x, putting the
    # measured point at ~4x, comfortably inside the bound. The LAW is
    # still quadratic at fixed k; the 100 TB lever remains k ∝ corpus —
    # SCALE.md "Selection module".)
}


def main() -> None:
    json_path = None
    argv = list(sys.argv[1:])
    if "--json" in argv:
        i = argv.index("--json")
        if i + 1 >= len(argv):
            raise SystemExit("--json requires a PATH argument")
        json_path = argv[i + 1]
        del argv[i : i + 2]  # the PATH value must not leak into positionals
    args = [a for a in argv if not a.startswith("--")]
    if "--docs" in sys.argv:
        batch, small, big, label = (
            PROBE_DOCS,
            args[0] if len(args) > 0 else REAL_SMALL,
            args[1] if len(args) > 1 else REAL_BIG,
            "realistic-dup docs (10% dup rate both scales)",
        )
    else:
        batch = PROBE2 if "--batch2" in sys.argv else PROBE
        small = SF01
        big = args[0] if args else "/tmp/sfprobe1"
        label = "key-shifted tiled"
    copies = 10.0
    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod._queries_unordered()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, sf_dir):
        release_scratch()
        best = None
        for _ in range(2):  # min-of-2; JIT is warmed by the small pass
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            best = (
                time.perf_counter() - t0
                if best is None
                else min(best, time.perf_counter() - t0)
            )
        return best

    def rows(name, sf_dir):
        release_scratch()
        return qs[name](spark, sf_dir).count()

    jf = None
    if json_path:
        # batch 1 (the first command of the documented sequence) truncates;
        # the later batches append into the same per-round file
        mode = "a" if ("--docs" in sys.argv or "--batch2" in sys.argv) else "w"
        jf = open(json_path, mode)
    print(f"# 10x probe [{label}]: {small} -> {big}, "
          f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], min-of-2")
    print(f"# {'query':26s} {'small':>7s} {'big':>8s} {'t-ratio':>8s} "
          f"{'rows_s':>8s} {'rows_b':>9s} {'r-ratio':>8s}  note")
    for name in batch:
        t_small = timed(name, small)
        t_big = timed(name, big)
        ratio = t_big / t_small
        n_small, n_big = rows(name, small), rows(name, big)
        rratio = n_big / max(n_small, 1)
        # fixed per-query overhead (~0.3 s of job scheduling) forgiven;
        # clean = grows no faster than the data step OR the output rows.
        # BOTH the raw and the overhead-adjusted ratio must exceed the
        # bound to flag: for sub-second baselines the adjustment divides
        # by the 0.1 s floor and would flag trivially-linear operators
        adj = (t_big - 0.3) / max(t_small - 0.3, 0.1)
        bound = max(copies, rratio) * 1.2
        ok, ok_via, adj_out = classify(ratio, adj, bound, t_small)
        note = "OK" if ok else ("ALLOW" if name in ALLOW else "SUPER-LINEAR")
        print(
            f"{name:28s} {t_small:6.2f}s {t_big:7.2f}s {ratio:7.1f}x "
            f"{n_small:8d} {n_big:9d} {rratio:7.1f}x  {note}"
        )
        sys.stdout.flush()
        if jf is not None:
            import json

            jf.write(json.dumps({
                "query": name,
                "batch": label,
                "t_small": round(t_small, 3),
                "t_big": round(t_big, 3),
                "t_ratio": round(ratio, 2),
                "adj_ratio": adj_out,
                "adj_note": ("sub-floor" if adj_out is None else None),
                "rows_small": n_small,
                "rows_big": n_big,
                "r_ratio": round(rratio, 2),
                "bound": round(bound, 2),
                "ok": ok,
                "ok_via": ok_via,
                "allowed": name in ALLOW,
                "allow_reason": ALLOW.get(name),
            }, separators=(",", ":")) + "\n")
            jf.flush()
    if jf is not None:
        jf.close()
    spark.stop()


if __name__ == "__main__":
    main()
