"""ANSI-SQL emitter for the diff operator (reference surface parity S7/S8/S9).

The reference's user-facing artifact is rendered SQL in a fixed 3-CTE shape
(/root/reference/checkatron/templates/full_compare.sql.j2:10-86). This module
re-derives that shape programmatically (no Jinja) so we can:

1. expose a ``render_diff_sql()`` parity feature (diffgen.py --out, S7),
2. generate the DuckDB oracle queries the driver uses for correctness
   (the SQL is engine-portable: plain CTEs, LEFT JOIN, CASE, IS NULL),
3. flatten to a single line / append to a statement stack (diffgen.py:121-140,
   S8/S9).

The emitted SQL is the reference's *plan shape* (key-UNION + two left joins),
which independently cross-checks our engine's single full-outer-join rewrite.
"""

from __future__ import annotations

from pathlib import Path

__all__ = [
    "render_diff_sql",
    "render_summary_sql",
    "single_line",
    "append_to_stack",
]


def _q(name: str) -> str:
    """Quote an identifier so DuckDB/Spark preserve its exact case."""
    return '"' + name.replace('"', '""') + '"'


def render_diff_sql(
    before_table: str,
    after_table: str,
    keys: list[str],
    before_cols: list[str],
    after_cols: list[str],
    *,
    before_where: str | None = None,
    after_where: str | None = None,
    create_table: str | None = None,
    column_case: str = "upper",
) -> str:
    """Render the full diff as portable ANSI SQL.

    ``before_cols``/``after_cols`` are the physical column names of each side
    (any case); output status/key columns are case-normalized like the engine
    (diffgen.py:73,76-80). ``create_table`` wraps the query in
    ``CREATE OR REPLACE TABLE <t> AS`` (CTAS sink S5).
    """
    up = str.upper if column_case == "upper" else (
        str.lower if column_case == "lower" else (lambda s: s)
    )
    keys_n = [up(k) for k in keys]
    before_n = [up(c) for c in before_cols]
    after_n = [up(c) for c in after_cols]
    all_cols = before_n + [c for c in after_n if c not in set(before_n)]
    # physical-name lookup per side (referenced unquoted: engines resolve
    # case-insensitively for unquoted identifiers)
    b_phys = dict(zip(before_n, before_cols))
    a_phys = dict(zip(after_n, after_cols))

    key_list = ", ".join(b_phys.get(k, a_phys.get(k, k)) for k in keys_n)
    bw = f"\n    WHERE {before_where}" if before_where else ""
    aw = f"\n    WHERE {after_where}" if after_where else ""

    joined_select = []
    for k in keys_n:
        joined_select.append(f"k.{b_phys.get(k, k)} AS {_q('K_' + k)}")
    for c in all_cols:
        if c in b_phys:
            joined_select.append(f"b.{b_phys[c]} AS {_q('b_' + c)}")
        else:
            joined_select.append(f"NULL AS {_q('b_' + c)}")
    for c in all_cols:
        if c in a_phys:
            joined_select.append(f"a.{a_phys[c]} AS {_q('a_' + c)}")
        else:
            joined_select.append(f"NULL AS {_q('a_' + c)}")

    def null_safe_on(side: str) -> str:
        # null-safe equality in the reference's explicit OR form
        # (full_compare.sql.j2:57-58) — portable to every dialect
        parts = []
        for k in keys_n:
            kk = b_phys.get(k, a_phys.get(k, k))
            parts.append(
                f"({side}.{kk} IS NULL AND k.{kk} IS NULL OR {side}.{kk} = k.{kk})"
            )
        return "\n      AND ".join(parts)

    status_cases = []
    for c in all_cols:
        b, a = _q("b_" + c), _q("a_" + c)
        status_cases.append(
            f"CASE\n"
            f"        WHEN {b} IS NULL AND {a} IS NULL THEN 0\n"
            f"        WHEN {b} IS NULL AND {a} IS NOT NULL THEN 2\n"
            f"        WHEN {b} IS NOT NULL AND {a} IS NULL THEN 3\n"
            f"        WHEN {b} = {a} THEN 0\n"
            f"        ELSE 1\n"
            f"    END AS {_q(c)}"
        )

    k1b, k1a = _q("b_" + keys_n[0]), _q("a_" + keys_n[0])
    final_cols = ",\n    ".join(
        [
            f"CASE\n"
            f"        WHEN {k1b} IS NULL THEN 4\n"
            f"        WHEN {k1a} IS NULL THEN 5\n"
            f"        ELSE NULL\n"
            f"    END AS {_q('_row_status')}"
        ]
        + [_q("K_" + k) for k in keys_n]
        + status_cases
    )

    prefix = f"CREATE OR REPLACE TABLE {create_table} AS\n" if create_table else ""
    return (
        f"{prefix}WITH\n"
        f"before_filt AS (\n    SELECT * FROM {before_table}{bw}\n),\n"
        f"after_filt AS (\n    SELECT * FROM {after_table}{aw}\n),\n"
        f"all_keys AS (\n"
        f"    SELECT {key_list} FROM before_filt\n"
        f"    UNION\n"
        f"    SELECT {key_list} FROM after_filt\n"
        f"),\n"
        f"joined AS (\n"
        f"    SELECT\n        " + ",\n        ".join(joined_select) + "\n"
        f"    FROM all_keys k\n"
        f"    LEFT JOIN before_filt b\n      ON " + null_safe_on("b") + "\n"
        f"    LEFT JOIN after_filt a\n      ON " + null_safe_on("a") + "\n"
        f")\n"
        f"SELECT\n    {final_cols}\nFROM joined"
    )


def render_summary_sql(diff_sql: str, value_cols: list[str]) -> str:
    """Wrap a rendered diff query in the summary aggregation (A1/A2,
    README.md:188-192) using ``_row_status IS NULL`` for matches
    (SURVEY.md section 1.4 inconsistency resolution)."""
    any_diff = " OR ".join(f"{_q(c)} > 0" for c in value_cols) or "FALSE"
    rs = _q("_row_status")
    return (
        f"WITH diff_result AS (\n{diff_sql}\n)\n"
        f"SELECT\n"
        f"    COUNT(*) AS total_rows,\n"
        f"    COUNT(*) FILTER (WHERE {rs} IS NULL) AS matched_rows,\n"
        f"    COUNT(*) FILTER (WHERE {rs} = 4) AS missing_in_before,\n"
        f"    COUNT(*) FILTER (WHERE {rs} = 5) AS missing_in_after,\n"
        f"    COUNT(*) FILTER (WHERE {rs} IS NULL AND ({any_diff})) AS changed_rows\n"
        f"FROM diff_result"
    )


def single_line(sql: str) -> str:
    """Single-line flattener (S8, diffgen.py:121-129): drop ``--`` comment
    lines, collapse all whitespace to single spaces. Block comments survive
    (run-sql-steps.sh:3-4 convention)."""
    kept = [ln for ln in sql.splitlines() if not ln.lstrip().startswith("--")]
    return " ".join(" ".join(kept).split())


def append_to_stack(sql: str, stack_path: str | Path) -> None:
    """Statement-stack sink (S9, diffgen.py:136-140): append the single-line
    statement to a FIFO stack file, one statement per line."""
    with Path(stack_path).open("a", encoding="utf-8") as f:
        f.write(single_line(sql).rstrip() + "\n")
