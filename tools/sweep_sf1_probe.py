"""sf1 timing probe (VERDICT r5 item 6): time the 10 most expensive
operators at 10x the bench scale and report per-query growth vs sf0.1.

sf0.1 is ~600k lineitem rows / 5k docs — nonlinear blowups (candidate
explosion in LSH bands, window spills, driver collects that secretly
scale with data) can hide below that. This probe runs each operator once
warm at BOTH scales in one session and prints the sf1/sf0.1 ratio next
to the 10x data growth, flagging anything super-linear (> ~12x after a
fixed-overhead allowance).

Correctness stays graded at sf0.01/sf0.1 (the driver's gate); this is
timing only, against the deterministic tiled probe data from
tools/gen_sf_probe.py (TESTDATA dirs are read-only, so the probe set
lives in scratch).

Usage: python tools/gen_sf_probe.py /tmp/sfprobe1 10 &&
       python tools/sweep_sf1_probe.py /tmp/sfprobe1 > SWEEP_r06_sf1.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from checkatron_spark.session import get_spark, release_scratch  # noqa: E402

SF01 = "/root/testdata/sf0.1"

PROBE = [
    "neardup_minhash_lsh",
    "neardup_minhash_banded",
    "stream_patch_apply",
    "stream_ivm_totals",
    "ann_ivf_topk",
    "dedup_corpus_e2e",
    "decontaminate_bloom",
    "dedup_spans_keep_first",
    "substring_dup_pairs",
    "kmeans_domains",
]

# second batch (SWEEP_r06 part 2): the flagship diff + the heaviest
# TPC-H/window/corpus/events shapes (needs the full tiled table set)
PROBE2 = [
    "diff_orders",
    "diff_lineitem_multikey",
    "q21_sole_late_supplier",
    "q9_product_profit",
    "neardup_clusters",
    "strip_boilerplate",
    "curation_funnel",
    "tfidf_top_terms",
    "events_sessionize",
    "trailing_30d_revenue",
]


def main() -> None:
    probe_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe1"
    copies = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    batch = PROBE2 if "--batch2" in sys.argv else PROBE
    spark = get_spark("sf1-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod._queries_unordered()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, sf_dir):
        release_scratch()
        best = None
        for _ in range(2):  # min-of-2; JIT is warmed by the sf0.1 pass
            t0 = time.perf_counter()
            force(qs[name](spark, sf_dir))
            best = (
                time.perf_counter() - t0
                if best is None
                else min(best, time.perf_counter() - t0)
            )
        return best

    print(f"# sf1 probe: {probe_dir} ({copies:g}x sf0.1 tiled), "
          f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], min-of-2")
    print(f"# {'query':28s} {'sf0.1':>8s} {'sf1':>9s} {'ratio':>7s}  note")
    for name in batch:
        t_small = timed(name, SF01)
        t_big = timed(name, probe_dir)
        ratio = t_big / t_small
        # fixed per-query overhead (~0.3 s of job scheduling) forgiven
        # before calling growth super-linear at a 10x data step
        adj = (t_big - 0.3) / max(t_small - 0.3, 1e-9)
        note = "OK (<= ~linear)" if adj <= copies * 1.2 else "SUPER-LINEAR"
        print(
            f"{name:30s} {t_small:7.2f}s {t_big:8.2f}s {ratio:6.1f}x  {note}"
        )
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
