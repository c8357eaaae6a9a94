"""Per-entry map diff: status coding over entry add/remove/change, row
presence 4/5, and absent-entry/NULL-value coalescing."""

from __future__ import annotations

from checkatron_spark.operators.mapdiff import map_diff


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, meta map<string,string>")


def test_map_diff_entry_statuses(spark):
    b = _df(spark, [
        (1, {"x": "1", "y": "2", "gone": "g"}),
        (2, {"x": "1"}),                      # row deleted in after
    ])
    a = _df(spark, [
        (1, {"x": "1", "y": "CHANGED", "new": "n"}),
        (3, {"z": "9"}),                      # row added in after
    ])
    got = {
        (r["K_k"], r["entry_key"]): (r["_row_status"], r["status"])
        for r in map_diff(b, a, ["k"], "meta").collect()
    }
    assert got == {
        (1, "x"): (None, 0),      # unchanged entry
        (1, "y"): (None, 1),      # changed entry
        (1, "gone"): (None, 3),   # entry only in before
        (1, "new"): (None, 2),    # entry only in after
        (2, "x"): (5, 3),         # whole row missing in after
        (3, "z"): (4, 2),         # whole row missing in before
    }


def test_map_diff_null_value_equals_absent(spark):
    """An explicit NULL value and a missing entry coalesce — mirroring the
    wide diff's treatment of missing columns as NULL."""
    b = _df(spark, [(1, {"x": None})])
    a = _df(spark, [(1, {})])
    rows = map_diff(b, a, ["k"], "meta").collect()
    assert [(r["entry_key"], r["status"]) for r in rows] == [("x", 0)]
