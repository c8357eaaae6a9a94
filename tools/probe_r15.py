"""Round-15 optimization probe: same-session min-of-N timings + plan dumps.

Same method as tools/probe_r14.py (cross-bench totals swing ±15-17%
between host epochs — SCALE.md — so per-change evidence is one JVM timing
the queries under test back to back), plus a ``--build-only`` mode that
times DataFrame CONSTRUCTION alone (no action): round 14 measured ~2 s of
driver-side Catalyst/py4j work building ann_recall_audit's 6-subtree
union, and this round's item #1 needs that number tracked separately from
execution.

Usage:
  python tools/probe_r15.py q1 q2 ...            # min-of-4 timings
  python tools/probe_r15.py --runs 6 q1 q2
  python tools/probe_r15.py --explain q1 q2      # dump plans/r15/<q>_<tag>.txt
  python tools/probe_r15.py --tag before --explain q1
  python tools/probe_r15.py --build-only q1      # construction time only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from checkatron_spark.session import get_spark, release_scratch  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark("probe-r15")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod._queries_unordered()
    missing = [q for q in args.queries if q not in qs]
    if missing:
        sys.exit(f"unknown queries: {missing}")

    if not args.no_warm:
        for warm in ("q6_forecast_revenue", "diff_orders"):
            if warm in qs:
                _force(qs[warm](spark, SF_DIR))

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plans_dir = os.path.join(here, "plans", "r15")

    for name in args.queries:
        release_scratch()
        if args.explain:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, SF_DIR)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            out = os.path.join(plans_dir, f"{name}_{args.tag}.txt")
            with open(out, "w") as fh:
                fh.write(txt)
            print(f"[probe] plan -> {out}", file=sys.stderr)
            release_scratch()
        spark.sparkContext.setJobDescription(f"probe:{name}")
        runs = []
        for _ in range(args.runs):
            release_scratch() if args.build_only else None
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            build = round(time.perf_counter() - t0, 3)
            if not args.build_only:
                _force(df)
            total = round(time.perf_counter() - t0, 3)
            runs.append((total, build))
        spark.sparkContext.setJobDescription(None)
        if not runs:
            continue  # --runs 0: plan dump only
        totals = [r[0] for r in runs]
        builds = [r[1] for r in runs]
        rec = {
            "q": name,
            "min": min(totals),
            "runs": totals,
            "build_min": min(builds),
            "builds": builds,
            "postwarm_min": min(totals[1:]) if len(totals) > 1 else totals[0],
        }
        print(json.dumps(rec))
        print(
            f"[probe] {name}: min={rec['min']} build_min={rec['build_min']}"
            f" runs={totals}",
            file=sys.stderr,
        )

    spark.stop()


if __name__ == "__main__":
    main()
