"""Diff summarization / drill-down operators.

These reproduce the reference's validation layer (README.md:186-196,
tools/step_ledger.py:253-259) with one deliberate correction: the reference
README counts matches with ``_row_status = 0``, but the current template emits
NULL for matched rows (full_compare.sql.j2:71, pinned by
tests/test_diffgen.py:55-56) — so matches are counted with
``_row_status IS NULL`` here (SURVEY.md section 1.4).

All aggregation is a single global partial+final hash aggregate — no grouping
keys, so at 100 TB this is a map-side-combined scan with a 1-row reduce.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["diff_summary", "diff_drilldown", "decode_status", "labeled_counts"]

# status int -> human label (samples/setup_all.sql section-5 decode block)
STATUS_LABELS = {
    0: "MATCH",
    1: "DIFFERENT",
    2: "NULL_IN_BEFORE",
    3: "NULL_IN_AFTER",
}
ROW_STATUS_LABELS = {4: "MISSING_IN_BEFORE", 5: "MISSING_IN_AFTER"}


def _value_cols(diff_df: DataFrame) -> list[str]:
    return [
        c for c in diff_df.columns if c != "_row_status" and not c.startswith("K_")
    ]


def _count_if(cond: Column, alias: str) -> Column:
    # SUM(CASE WHEN cond THEN 1 ELSE 0 END) shape (README.md:189-192) but as
    # count_if -> BIGINT, map-side combinable.
    return F.count_if(cond).alias(alias)


def diff_summary(
    diff_df: DataFrame, *, exclude: list[str] | None = None
) -> DataFrame:
    """One-row summary: totals + row-presence + any-value-difference counts
    (conditional-sum aggregation A2, tools/step_ledger.py:254-258).

    ``exclude`` drops columns from the changed-row predicate — schema-drift
    columns (present on one side only) are status 2/3 on EVERY row by
    construction, so counting them as "changed" would mark the whole table;
    the reference's published sample expectation ("2 rows with differences",
    README.md:201, with drift column NEW_COLUMN=2 everywhere) only holds
    with the drift column excluded."""
    vcols = _value_cols(diff_df)
    if exclude:
        dropped = {c.upper() for c in exclude}
        vcols = [c for c in vcols if c.upper() not in dropped]
    # rendered as ONE parsed SQL expression, not a python reduce of Column
    # `|` calls: at warehouse-DESCRIBE widths the per-column py4j round
    # trips dominate plan construction (round 10 — same fix as the diff
    # projection, SCALE.md "Core diff"); the parsed tree is identical
    any_diff = (
        F.expr(
            " OR ".join(
                "`" + c.replace("`", "``") + "` > 0" for c in vcols
            )
        )
        if vcols
        else F.lit(False)
    )
    rs = F.col("_row_status")
    return diff_df.agg(
        F.count(F.lit(1)).alias("total_rows"),
        _count_if(rs.isNull(), "matched_rows"),
        _count_if(rs == 4, "missing_in_before"),
        _count_if(rs == 5, "missing_in_after"),
        _count_if(rs.isNull() & any_diff, "changed_rows"),
    )


def diff_drilldown(diff_df: DataFrame) -> DataFrame:
    """Rows with a row-presence problem: ``WHERE _row_status > 0``
    (README.md:196). Matched rows have NULL status, so this selects 4/5 only.
    """
    return diff_df.filter(F.col("_row_status") > 0)


def decode_status(diff_df: DataFrame, column: str) -> DataFrame:
    """Decode one column's status ints to labels (status-decoding CASE C3,
    samples/setup_all.sql section 5)."""
    col = F.col(f"`{column}`")
    label = (
        F.when(col == 0, STATUS_LABELS[0])
        .when(col == 1, STATUS_LABELS[1])
        .when(col == 2, STATUS_LABELS[2])
        .when(col == 3, STATUS_LABELS[3])
        .otherwise(F.lit("UNKNOWN"))
    )
    row_label = (
        F.when(F.col("_row_status") == 4, ROW_STATUS_LABELS[4])
        .when(F.col("_row_status") == 5, ROW_STATUS_LABELS[5])
        .otherwise(F.lit("PRESENT_BOTH"))
    )
    keys = [c for c in diff_df.columns if c.startswith("K_")]
    return diff_df.select(
        F.col("_row_status"),
        row_label.alias("row_label"),
        *keys,
        col.alias(column),
        label.alias(f"{column}_label"),
    )


def labeled_counts(dfs: dict[str, DataFrame]) -> DataFrame:
    """Per-table labeled counts stacked with UNION ALL (A3/U2,
    README.md:136-143): ``SELECT 'NAME' AS source, COUNT(*) ...``."""
    parts = [
        df.agg(F.count(F.lit(1)).alias("row_count")).select(
            F.lit(name).alias("source"), F.col("row_count")
        )
        for name, df in dfs.items()
    ]
    return reduce(lambda x, y: x.unionByName(y), parts)
