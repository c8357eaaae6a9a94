"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
collect-to-driver bottleneck) — the same shape a cluster job would have.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from checkatron_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _force(df) -> int:
    """Force full evaluation of every column (count() alone would let
    Catalyst prune the projections)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    spark = get_spark("checkatron-bench")
    spark.sparkContext.setLogLevel("ERROR")
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]

    timings: dict[str, float] = {}
    qs = entrymod.queries()
    # warm the JVM/readers once so timings measure the engine, not startup
    # one aggregation-shaped and one join-shaped query so whole-stage-codegen
    # JIT for both paths is compiled before anything is timed
    for warm in ("q6_forecast_revenue", "diff_orders"):
        if warm in qs:
            _force(qs[warm](spark, SF_DIR))

    total = 0.0
    for name in sorted(qs):
        best = None
        for _ in range(2):  # min-of-2: strips GC/scheduler noise from local[32]
            t0 = time.perf_counter()
            _force(qs[name](spark, SF_DIR))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        total += timings[name]

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
