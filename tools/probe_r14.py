"""Round-14 optimization probe: same-session min-of-N timings + plan dumps.

Cross-bench totals on this host swing ±15-17% between epochs (SCALE.md),
so per-change evidence comes from ONE JVM timing the queries under test
back to back (min-of-N each), not from comparing two full bench runs.

Usage:
  python tools/probe_r14.py q1 q2 ...            # min-of-4 timings
  python tools/probe_r14.py --runs 6 q1 q2
  python tools/probe_r14.py --explain q1 q2      # dump plans/r14/<q>_<tag>.txt
  python tools/probe_r14.py --tag before --explain q1

Timings go to stdout as one JSON line per query (and a plain table on
stderr); plans to plans/r14/. The noop sink forces every column of every
row, same methodology as bench.py.
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
    ap.add_argument("--tag", default="probe")
    ap.add_argument("--no-warm", action="store_true")
    args = ap.parse_args()

    spark = get_spark("probe-r14")
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
    plans_dir = os.path.join(here, "plans", "r14")

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
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            runs.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        rec = {"q": name, "min": min(runs), "runs": runs,
               "postwarm_min": min(runs[1:]) if len(runs) > 1 else runs[0]}
        print(json.dumps(rec))
        print(f"[probe] {name}: min={rec['min']} runs={runs}", file=sys.stderr)

    spark.stop()


if __name__ == "__main__":
    main()
