"""CLI mirroring the reference's argparse surface (G4, diffgen.py:50-66),
plus an ``--execute`` mode the reference can't have: the reference only
renders SQL for an external warehouse; this engine IS the warehouse, so the
same invocation can run the diff on Spark and persist/display the result.

Modes
-----
default       render portable diff SQL from two DESCRIBE CSVs -> --out
              (plus --single_line / --stack_input, S7/S8/S9)
--execute     additionally run the diff natively: reads the two tables
              (parquet paths or saved tables), executes the single
              full-outer-join plan, writes ``diff_result`` (S5/S6) and
              prints the summary aggregation (A1/A2).

Usage examples
--------------
python -m checkatron_spark.cli before.csv after.csv --keys keys.csv \
    --out diff.sql --single_line --stack_input stack.sql
python -m checkatron_spark.cli before.csv after.csv --keys keys.csv \
    --execute --before_path /data/before.parquet --after_path /data/after.parquet
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

from checkatron_spark.plans.sqlgen import append_to_stack, render_diff_sql
from checkatron_spark.sources.schema_csv import (
    infer_table_name,
    load_keys_csv,
    load_schema_csv,
)

__all__ = ["build_sql", "main", "parse_args"]


def parse_args(argv: list[str]) -> argparse.Namespace:
    p = argparse.ArgumentParser(
        prog="checkatron-spark",
        description="Generate (and optionally execute) a brute-force table diff",
    )
    # the reference surface, flag-for-flag (diffgen.py:50-66)
    p.add_argument("before_csv", type=Path, help="CSV from DESCRIBE TABLE (before)")
    p.add_argument("after_csv", type=Path, help="CSV from DESCRIBE TABLE (after)")
    p.add_argument("--keys", type=Path, required=True,
                   help="CSV with the DESCRIBE header but only the key columns")
    p.add_argument("--before_where", default="", help="Free-form WHERE (before)")
    p.add_argument("--after_where", default="", help="Free-form WHERE (after)")
    p.add_argument("--before_table", help="Override DB.SCHEMA.TABLE (before)")
    p.add_argument("--after_table", help="Override DB.SCHEMA.TABLE (after)")
    p.add_argument("--out", type=Path, default=Path("diff.sql"),
                   help="Output SQL file")
    p.add_argument("--single_line", action="store_true",
                   help="Emit SQL as one line (drop -- comments, collapse space)")
    p.add_argument("--stack_input", type=Path,
                   help="Append the single-line SQL to this stack file")
    # engine extensions
    p.add_argument("--execute", action="store_true",
                   help="Also run the diff natively on Spark")
    p.add_argument("--before_path", help="Parquet path for the before table")
    p.add_argument("--after_path", help="Parquet path for the after table")
    p.add_argument("--result_table", default="diff_result",
                   help="Sink table name (CTAS overwrite)")
    p.add_argument("--temp_view", action="store_true",
                   help="Sink as a temp view instead of a saved table")
    return p.parse_args(argv)


def build_sql(args: argparse.Namespace) -> str:
    """Render the portable diff SQL from the schema CSVs (library API parity
    with the reference's ``build_sql``, checkatron/__init__.py:7-9)."""
    before_cols = [r["name"] for r in load_schema_csv(args.before_csv)]
    after_cols = [r["name"] for r in load_schema_csv(args.after_csv)]
    keys = load_keys_csv(args.keys)
    return render_diff_sql(
        infer_table_name(args.before_csv, args.before_table),
        infer_table_name(args.after_csv, args.after_table),
        keys,
        before_cols,
        after_cols,
        before_where=args.before_where or None,
        after_where=args.after_where or None,
        create_table=args.result_table,
    )


def _execute(args: argparse.Namespace) -> None:
    from checkatron_spark import diff, diff_summary, get_spark
    from checkatron_spark.sources.tables import save_diff_result

    spark = get_spark("checkatron-cli")
    read = lambda path, table: (  # noqa: E731
        spark.read.parquet(path) if path else spark.read.table(table)
    )
    before = read(args.before_path, infer_table_name(args.before_csv, args.before_table))
    after = read(args.after_path, infer_table_name(args.after_csv, args.after_table))
    d = diff(
        before, after, load_keys_csv(args.keys),
        before_where=args.before_where or None,
        after_where=args.after_where or None,
    )
    save_diff_result(d, args.result_table, temporary=args.temp_view)
    for row in diff_summary(
        spark.table(args.result_table) if not args.temp_view else d
    ).collect():
        print(row.asDict())


def main(argv: list[str] | None = None) -> int:
    args = parse_args(sys.argv[1:] if argv is None else argv)
    sql = build_sql(args)
    # reference behavior (diffgen.py:130-140): --out always gets the full
    # multi-line SQL; the stack file gets the single-line form, and only
    # when BOTH --single_line and --stack_input are set
    args.out.write_text(sql, encoding="utf-8")
    print(f"SQL written to {args.out}")
    if args.stack_input and args.single_line:
        append_to_stack(sql, args.stack_input)
        print(f"Appended single-line SQL to {args.stack_input}")
    if args.execute:
        _execute(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
