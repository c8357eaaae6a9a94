"""Round-15 item #1 measurement: where does ann_recall_audit's ~2 s of
driver-side DataFrame CONSTRUCTION go? Times construction alone (no
action) and cProfiles it, attributing cumulative time to the py4j
boundary, F.expr/selectExpr SQL parses, and createDataFrame literal
tables. Run on a quiet host; numbers go to stderr, a JSON line to stdout.
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from checkatron_spark import pipelines as P  # noqa: E402
from checkatron_spark.session import get_spark, release_scratch  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("profile-audit-r15")
    spark.sparkContext.setLogLevel("ERROR")

    # warm: one full construction + execution so codebook caches, JVM JIT
    # and the Python import graph are all settled before timing
    df = P.q_ann_recall_audit(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    release_scratch()

    builds = []
    for _ in range(5):
        release_scratch()
        t0 = time.perf_counter()
        P.q_ann_recall_audit(spark, SF_DIR)
        builds.append(round(time.perf_counter() - t0, 3))

    release_scratch()
    prof = cProfile.Profile()
    prof.enable()
    P.q_ann_recall_audit(spark, SF_DIR)
    prof.disable()

    s = io.StringIO()
    st = pstats.Stats(prof, stream=s).sort_stats("cumulative")
    st.print_stats(40)
    print(s.getvalue(), file=sys.stderr)

    # bucket tottime by boundary
    buckets = {"py4j_socket": 0.0, "total": 0.0}
    for (fn, _ln, name), (cc, nc, tt, ct, callers) in prof.stats.items():
        buckets["total"] += tt
        if "py4j" in fn and ("send_command" in name or "recv" in name
                             or "readline" in name):
            buckets["py4j_socket"] += tt
    print(json.dumps({"builds": builds, "build_min": min(builds),
                      "buckets": {k: round(v, 3) for k, v in buckets.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
