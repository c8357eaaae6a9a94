#!/usr/bin/env python3
"""Worked end-to-end example for checkatron_spark — the parity twin of the
reference's samples/run_example.py (reference samples/run_example.py:49-57
builds CLI args programmatically and renders the diff SQL; this engine
EXECUTES the diff, so the example builds two DataFrames, runs the operator,
the summary, the drill-down, and the DIFF(...) SQL macro).

Self-contained: synthesizes its own before/after frames (no fixture files),
so it runs anywhere the package imports — CI executes it as a smoke test,
mirroring the reference ci.yml:58.

Run from the repo root:  python samples/run_example.py
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from checkatron_spark import diff, diff_drilldown, diff_summary, get_spark
from checkatron_spark.plans.sqlmacro import sql as macro_sql


def main() -> None:
    print("checkatron_spark example — executing a table diff")
    print("=" * 60)
    spark = get_spark("checkatron-example", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    # two snapshots of one small orders table: a changed price (id 2), a
    # row that vanished (id 4), a new row (id 5), and a NULL transition
    # (id 3) — every diff status fires
    before = spark.createDataFrame(
        [
            (1, "alice", 100.0),
            (2, "bob", 250.0),
            (3, "carol", None),
            (4, "dave", 75.0),
        ],
        ["order_id", "customer", "amount"],
    )
    after = spark.createDataFrame(
        [
            (1, "alice", 100.0),
            (2, "bob", 300.0),
            (3, "carol", 50.0),
            (5, "erin", 10.0),
        ],
        ["order_id", "customer", "amount"],
    )

    print("\n1. Full diff (per-column status codes):")
    d = diff(before, after, ["order_id"])
    d.orderBy("ORDER_ID").show(truncate=False)

    print("2. Summary rollup:")
    diff_summary(d).show(truncate=False)

    print("3. Drill-down (changed/missing rows only — _row_status > 0):")
    diff_drilldown(d).orderBy("ORDER_ID").show(truncate=False)

    print("4. The same diff through the DIFF(...) SQL table macro:")
    before.createOrReplaceTempView("orders_before")
    after.createOrReplaceTempView("orders_after")
    macro_sql(
        spark,
        """
        SELECT _row_status, COUNT(*) AS n
        FROM DIFF(orders_before, orders_after, KEYS(order_id))
        GROUP BY _row_status ORDER BY _row_status
        """,
    ).show(truncate=False)

    # sanity for the CI smoke: the diff saw every key from both sides
    n = d.count()
    assert n == 5, f"expected 5 diff rows, got {n}"
    print(f"OK — diff produced {n} rows (4 before + 1 after-only key)")
    spark.stop()


if __name__ == "__main__":
    main()
