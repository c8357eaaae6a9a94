"""Driver-side orchestration: FIFO statement runner and resumable step
ledger (reference parity X1-X3, SURVEY.md §2.11).

The reference executes generated SQL through two driver-side mechanisms:
a stack-file runner that pops one single-line statement at a time
(run-sql-steps.sh:20-40) and a sentinel-guarded resumable step ledger
(tools/step_ledger.py:65-88). Neither is a relational operator — here they
drive ``spark.sql`` in-process instead of spawning a warehouse client, so
"execute the stack" and "run the plan" are one JVM away from the data.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

from pyspark.sql import SparkSession

__all__ = ["run_stack", "Step", "run_steps", "archive_ledger"]


def run_stack(
    spark: SparkSession,
    stack_path: str | Path,
    log_path: str | Path | None = None,
    *,
    max_statements: int | None = None,
) -> int:
    """X1: execute single-line SQL statements from a FIFO stack file.

    Pops the FIRST line, runs it via ``spark.sql``, appends the result to
    the (append-only) log, and removes the line only on success — a failed
    statement stays at the head for retry, exactly the reference runner's
    crash-safety contract (run-sql-steps.sh:20-35). Returns the number of
    statements executed."""
    stack = Path(stack_path)
    log = Path(log_path) if log_path else None
    done = 0
    while True:
        lines = stack.read_text(encoding="utf-8").splitlines() if stack.exists() else []
        lines = [ln for ln in lines if ln.strip()]
        if not lines or (max_statements is not None and done >= max_statements):
            return done
        sql = lines[0]
        result = spark.sql(sql)  # raises on failure -> statement stays queued
        rows = result.collect()
        if log:
            with log.open("a", encoding="utf-8") as f:
                f.write(f"-- OK: {sql[:120]}\n")
                for r in rows[:20]:
                    f.write(f"{tuple(r)}\n")
        stack.write_text("\n".join(lines[1:]) + ("\n" if lines[1:] else ""),
                         encoding="utf-8")
        done += 1


class Step:
    """X2: one resumable unit — skipped when its ``<name>.ok`` sentinel
    exists, sentinel written only after ``fn`` returns."""

    def __init__(self, name: str, fn: Callable[[], object]):
        self.name = name
        self.fn = fn

    def run(self, ledger_dir: Path) -> bool:
        sentinel = ledger_dir / f"{self.name}.ok"
        if sentinel.exists():
            return False
        self.fn()
        sentinel.write_text("ok\n", encoding="utf-8")
        return True


def run_steps(steps: list[Step], ledger_dir: str | Path) -> list[str]:
    """Run steps in order, sentinel-guarded; returns the names actually
    executed (already-done steps are skipped — idempotent resume)."""
    d = Path(ledger_dir)
    d.mkdir(parents=True, exist_ok=True)
    return [s.name for s in steps if s.run(d)]


def archive_ledger(ledger_dir: str | Path) -> Path | None:
    """X3: move the ledger aside (never delete) so the plan restarts fresh;
    returns the archive path, or None if there was nothing to archive."""
    d = Path(ledger_dir)
    if not d.exists():
        return None
    n = 0
    while (archive := d.with_name(f"{d.name}.archive.{n}")).exists():
        n += 1
    d.rename(archive)
    return archive
