"""Three-way diff (base / ours / theirs) with per-column conflict detection.

The reference's two-sided diff (/root/reference/checkatron/templates/
full_compare.sql.j2) answers "what changed"; reconciling two divergent
snapshots of the same base — two teams' edits, two pipeline branches, a
backfill racing live writes — needs the three-way form: which side changed
each cell, and do the changes conflict?

Per-column codes (against the base value, null-safe):
    0 unchanged        neither side differs from base
    1 ours only        take ours
    2 theirs only      take theirs
    3 both, same       convergent edit — take either
    4 conflict         both changed, values differ — needs a policy

Presence is part of the lattice: a side missing the key contributes
all-NULL values (a delete reads as "changed to NULL"), and the boolean
``in_base/in_ours/in_theirs`` columns let callers tell row-level deletes
from cell-level NULLing.

Plan shape: two null-safe full-outer sort-merge joins on the business key.
Both joins shuffle on the same key expressions, so the second join reuses
the first's partitioning on its left side — cost ≈ 3 scans + 3 exchanges
(one per input), independent of column count. Statuses are pure post-join
codegen CASEs, exactly like the two-way diff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["diff3"]


def _tag(df: DataFrame, tag: str, keys: list[str], cols: list[str]) -> DataFrame:
    return df.select(
        F.lit(True).alias(f"in_{tag}"),
        *[F.col(k).alias(f"{tag}_{k}") for k in keys],
        *[F.col(c).alias(f"{tag}_{c}") for c in cols],
    )


def diff3(
    base: DataFrame,
    ours: DataFrame,
    theirs: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Per-key, per-column three-way merge statuses.

    Output: ``K_<key>`` coalesced key columns, ``in_base/in_ours/in_theirs``
    presence flags, and one ``<COL>`` int status (codes above) per compare
    column.
    """

    b = _tag(base, "base", keys, compare_cols)
    o = _tag(ours, "ours", keys, compare_cols)
    t = _tag(theirs, "theirs", keys, compare_cols)

    def keycond(left_tag: str, right_tag: str):
        cond = None
        for k in keys:
            eq = F.col(f"{left_tag}_{k}").eqNullSafe(F.col(f"{right_tag}_{k}"))
            cond = eq if cond is None else cond & eq
        return cond

    bo = b.join(o, keycond("base", "ours"), "full_outer")
    # join theirs against the BASE key when present, else the ours key —
    # coalesced so keys absent from base still line up
    for k in keys:
        bo = bo.withColumn(
            f"_k_{k}", F.coalesce(F.col(f"base_{k}"), F.col(f"ours_{k}"))
        )
    cond = None
    for k in keys:
        eq = F.col(f"_k_{k}").eqNullSafe(F.col(f"theirs_{k}"))
        cond = eq if cond is None else cond & eq
    j = bo.join(t, cond, "full_outer")

    out_cols = [
        F.coalesce(F.col(f"_k_{k}"), F.col(f"theirs_{k}")).alias(f"K_{k.upper()}")
        for k in keys
    ]
    out_cols += [
        F.coalesce(F.col(f"in_{tag}"), F.lit(False)).alias(f"in_{tag}")
        for tag in ("base", "ours", "theirs")
    ]
    for c in compare_cols:
        bc, oc, tc = (F.col(f"{tag}_{c}") for tag in ("base", "ours", "theirs"))
        ours_chg = ~bc.eqNullSafe(oc)
        theirs_chg = ~bc.eqNullSafe(tc)
        status = (
            F.when(~ours_chg & ~theirs_chg, F.lit(0))
            .when(ours_chg & ~theirs_chg, F.lit(1))
            .when(~ours_chg & theirs_chg, F.lit(2))
            .when(oc.eqNullSafe(tc), F.lit(3))
            .otherwise(F.lit(4))
        )
        out_cols.append(status.cast("int").alias(c.upper()))
    return j.select(*out_cols)
