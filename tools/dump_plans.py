"""Regenerate PLANS.md: formatted physical plans for the headline queries.

Run from the repo root: ``python tools/dump_plans.py``. The output is the
reviewable evidence that each headline plan has the shape the scale design
calls for (single-join diff, broadcast dims, pushed filters, no cartesian
products) — the same properties tests/test_plans.py asserts mechanically.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from checkatron_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

HEADLINERS = [
    ("diff_orders", "core diff: ONE full-outer sort-merge join, statuses in codegen"),
    ("diff_orders_faithful", "reference 3-CTE shape: note the extra exchanges"),
    ("q5_region_revenue", "fact-fact shuffle join + broadcast dims"),
    ("q1_pricing_summary", "scan -> partial/final hash aggregate"),
    ("neardup_ngram_jaccard", "prefix-filter set-similarity join"),
    ("events_asof_join", "as-of: union + single window, one exchange"),
    ("orders_filtered", "pushed filters + pruned read schema"),
    ("diff_orders_incremental", "checksum-pruned diff: IN-list prune, no extra join"),
    ("q7_volume_shipping", "nation-pair disjunction over broadcast dims"),
    ("sample_deterministic", "hash sampling: filter at scan speed, zero shuffles"),
    ("pack_sequences_budget", "sequence packing: one window shuffle on lang"),
    ("quantize_embeddings_int8", "int8 quantization: pure codegen, no exchange"),
    ("scd2_orders_delta", "SCD2 merge delta: one full-outer join, explode-once emit"),
    ("sample_stratified", "stratified rebalancing: per-stratum CASE threshold, zero shuffles"),
    ("diff3_orders", "three-way merge diff: two key-shuffled full-outer joins"),
    ("fuzzy_part_names", "blocked fuzzy match: equi-join on block key, banded-DP kernel"),
    ("drift_orders", "drift profile: two single-row aggregates, join-free"),
    ("decontaminate_corpus", "decontamination: benchmark gram set broadcasts"),
    ("table_checksum_orders", "anti-entropy fingerprint: one map-combined aggregate"),
    ("delta_compact_orders", "compact CDC delta: one full-outer join, output proportional to churn"),
    ("salted_hot_key_join", "salted join: hot key spread over (key, salt) reducers"),
    ("ivm_orders_totals", "view maintenance: churn-sized adjustment join (view+delta built inline in this self-contained demo; production reads a materialized view)"),
    ("zorder_bucket_audit", "z-order audit: pure codegen bit interleave + one aggregate"),
    ("chunk_documents", "char chunking: narrow explode, zero shuffles"),
    ("dup_ngram_profile", "corpus dup-ngram profile: shingle shuffle + doc re-aggregate"),
    ("ann_ivf_topk", "exact IVF: probe join on cell id + bound-qualified extra probes"),
    ("vocab_coverage", "OOV profile: distributed TakeOrdered vocab + broadcast membership join"),
    ("corpus_snapshot_diff", "flagship diff over corpus snapshots: one full-outer join"),
    ("sample_topk_per_group", "per-group reservoir: one window shuffle on the group key"),
    ("interleave_sources", "stride interleave: per-group window, no global row-number funnel"),
    ("media_neardup_features", "media near-dup: mapInPandas features + lang-blocked cosine self-join"),
    ("strip_boilerplate", "boilerplate strip: tile docfreq groupBy + join-back, in-order rebuild"),
    ("gopher_quality_profile", "quality rule bundle: zero-shuffle integer-exact flags"),
    ("sample_temperature_mix", "temperature rebalance: integer-max scalar rates, broadcast back, hash filter"),
    ("dedup_incremental_status", "admission gate: base fp distinct + one shared-key join/window"),
    ("neardup_incremental_batch", "bipartite prefix-filter Jaccard: new-prefix x base-prefix candidates"),
    ("curation_funnel", "five-stage funnel: persisted stage frames, one pass per stage boundary"),
    ("dedup_corpus_e2e", "keep-list dedup: pairs -> components -> min-id keep -> semi-join (text only in final join)"),
    ("substring_dup_pairs", "winnowing substring dedup: char-gram min-hash fingerprints, join on fingerprint value"),
    ("decontaminate_semantic", "semantic decontamination: broadcast eval embeddings, probe-all scan"),
    ("quality_linear_score", "hashed-linear inference: zero-shuffle JVM fold, weights ride the scan"),
    ("kmeans_domains", "exact k-means (round 6): Arrow assignment kernel — MapInPandas over the scan, NO join; refit groupBy map-side combined"),
    ("dedup_corpus_staged", "staged dedup (round 6): md5 exact-collapse groupBy + semi-join feeding the pair pipeline over representatives only"),
    ("assign_doc_ids", "global ordinals (round 7): range-bucketed row_number — window PARTITIONED BY sampled bucket, offsets as a map literal; no single-partition window"),
    ("rollup_from_partials", "rollup reuse (round 7): monthly derives from daily partials — two chained hash aggregates, one raw scan"),
    ("ivm_join_enriched", "join-view IVM (round 8): broadcast anti joins keep untouched view rows; churn-sized delta joins; semi-pruned fact probe for dim churn"),
    ("pmi_collocations", "PMI collocations (round 8): two map-combined count passes; min_count-filtered pairs join unigrams; 1-row totals broadcast"),
    ("price_quantiles_from_partials", "mergeable quantiles (round 8): two chained hash aggregates + single-row bounded array fold — no global window, no collect"),
    ("ann_label_filtered_topk", "filtered ANN (round 8): block-equality hash join, per-query work = |block|; no nested loop"),
    ("events_session_stats", "session table (round 8): ONE user_id window shuffle (lag + ROWS running sum), then map-combined per-session aggregate"),
    ("takedown_propagation", "takedown cascade (round 8; r9: no forced broadcast — AQE sizes the source-scale removal set): codegen aggregate + removed-id join"),
    ("sessions_overlap_promos", "interval overlap join (round 8; r9: bins-per-interval cap compiled into the explode): both sides bin-exploded into an equi-join, later-start-bin pair attribution, no nested loop"),
    ("neardup_triangles", "triangle count (round 8): ordered-edge equi-join intersect; scalar 1-row crosses only"),
    ("ann_lsh_topk", "round 9: re-pointed at the IVF exact scale path (8 cells / 3 probed); MLlib BRP-LSH parity is pytest-only"),
    ("neardup_minhash_lsh", "round 9: re-pointed at the banded-MinHash scale path at a SECOND operating point (32 hashes, 16 AND-bands of 2, exact-Jaccard verify); MLlib MinHashLSH parity is pytest-only"),
    ("quality_floor_by_source", "per-source adaptive quality floor (round 10): one percentile-sketch aggregate per source, thresholds broadcast back; no corpus shuffle"),
    ("bm25_topk", "BM25 retrieval (round 10): term filter BEFORE the posting aggregate; df + corpus stats broadcast; global top-k is TakeOrderedAndProject"),
    ("contamination_frac", "graded contamination (round 10): eval gram set broadcasts, one corpus scan, broadcast LEFT join keeps zero-overlap docs"),
    ("dsir_importance", "DSIR weights (round 10; r11: JVM gram kernel — bigram pairs via native arrays_zip/slice, md5 digest in codegen, grams persisted once for both consumers); bucket counts map-side combined to <=256 rows; log-ratio table broadcast back"),
    ("semdedup_prune", "SemDeDup (round 10): kmeans Arrow kernel + per-cluster Arrow pair kernel (applyInPandas; r11: cluster-size fail-fast, k=None derives k from the corpus)"),
    ("novelty_profile", "first-seer novelty (round 10): gram min-doc_id groupBy + join-back + doc re-aggregate — the dup_ngram shape"),
    ("ccnet_ppl_buckets", "CCNet buckets (round 10): LM-coverage join + per-language tercile sketch broadcast back"),
    ("bm25_multiquery", "multi-profile BM25 (round 11): ONE posting-filtered corpus scan for N query profiles; broadcast (query, term) fan-out; two-phase per-query top-k — no single-reducer window"),
    ("dedup_canonical", "canonical-key dedup (round 11): (source, fp) groupBy map-side combined + id semi join; text never shuffles"),
    ("media_decode", "REAL media decode (round 12): mapInPandas stdlib BMP/PNG codecs over synthesized real image bytes — two chained Python stages, no shuffle, stats reduced per image in numpy"),
    ("token_count_bpe", "greedy-subword token counts (round 12): distinct-word groupBy -> Arrow kernel on the word TABLE (not the token stream) -> join back on word -> map-combined per-doc sum"),
    ("ann_pq_adc_topk", "PQ ADC search (round 12): Arrow encode kernel (codebooks in the task closure) + broadcast (s, code) EQUI join of the tiny per-query distance tables + two-phase top-k"),
    ("ann_pq_rerank_topk", "PQ + exact refine (round 12): ADC shortlist then |Q|*10 exact grid folds — re-rank cost independent of corpus size"),
    ("ann_hamming_topk", "sign-bit Hamming ANN (round 12): 32-bit word packing + xor/bit_count scoring in whole-stage codegen; |Q|-row broadcast"),
    ("mix_budget_plan_bpe", "mixture plan in SUBWORD tokens (round 12): token_count_bpe distinct-word kernel feeds the same exact-BIGINT planner"),
    ("ann_ivfpq_topk", "IVF-PQ (round 12; r13: codebooks sample-fit on 256 md5-ordered rows + disk-cached by corpus identity — the plan is now pure SEARCH): coarse cells + residual PQ codes; probed-cell (cell, s, code) EQUI join bounds candidates by cell population"),
    ("ann_recall_audit", "recall@k audit (round 13; r14: six methods — ann_ivf/ann_lsh joined): brute-force truth + compressed/bucketed searches composed; per-method hits via one broadcast pair-set join; totals via a 1-row scalar crossJoin"),
    ("ann_ivf_grid_topk", "grid-IVF (round 14): cached deterministic coarse fit + zero-shuffle Arrow assignment (residual=False) + broadcast probe table keyed on cell — candidates bounded by probed-cell population"),
    ("ann_lsh_banded_topk", "banded sign-bit LSH (round 14): codegen band folds, band-equality candidate hash join (|Q|-side broadcast), exact grid-distance rank over deduped candidates"),
    ("unicode_profile", "unicode honesty (round 14): declared-NFC replace chain + per-class regexp codepoint counts, ONE zero-shuffle partial aggregate + stack()"),
    ("ann_ivf_incremental", "incremental IVF (round 14): cached coarse fit + parquet index store, batch-only assignment kernel, broadcast tombstone anti-join, probed-cell search"),
    ("media_decode_wav", "stdlib WAV decode (round 13): mapInPandas wave reader over synthesized real RIFF bytes — map-only, stats reduced per clip in numpy"),
    ("bpe_train_segment", "BPE merge learning (round 13): one corpus explode+groupBy word count, then merge rounds over the persisted <=500-row head vocabulary — corpus contributes exactly one aggregate; argmax collects are 1 row"),
]


def main() -> None:
    spark = get_spark("dump-plans", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.full_queries()
    out = [
        "# PLANS — formatted physical plans for headline queries\n",
        f"Generated by `tools/dump_plans.py` at sf_dir=`{SF_DIR}`. "
        "Regenerate after any operator change.\n",
    ]
    for name, why in HEADLINERS:
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # formatted explain
            df._jdf.queryExecution(), "formatted"
        )
        # literal control chars (e.g. a \x01 concat_ws delimiter) would make
        # the file binary to grep/pagers — render them as escapes
        plan = "".join(
            ch if ch == "\n" or ord(ch) >= 32 else f"\\x{ord(ch):02x}"
            for ch in plan
        )
        out.append(f"\n## {name}\n\n*{why}*\n\n```\n{plan.strip()}\n```\n")
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write("".join(out))
    print("PLANS.md written")
    spark.stop()


if __name__ == "__main__":
    main()
