"""FIFO stack runner + step ledger: crash-safe pop semantics, idempotent
resume, archive-never-delete."""

from __future__ import annotations

import pytest

from checkatron_spark.runner import Step, archive_ledger, run_stack, run_steps


def test_run_stack_fifo(spark, tmp_path):
    stack = tmp_path / "stack.sql"
    log = tmp_path / "out.log"
    spark.sql("SELECT 1").createOrReplaceTempView("rs_smoke")
    stack.write_text(
        "CREATE OR REPLACE TEMPORARY VIEW rs_t AS SELECT 42 AS x\n"
        "SELECT x + 1 AS y FROM rs_t\n"
    )
    assert run_stack(spark, stack, log) == 2
    assert stack.read_text().strip() == ""  # drained
    text = log.read_text()
    assert "OK" in text and "(43,)" in text


def test_run_stack_failure_keeps_statement(spark, tmp_path):
    stack = tmp_path / "stack.sql"
    stack.write_text("SELECT * FROM table_that_does_not_exist_xyz\nSELECT 1\n")
    with pytest.raises(Exception):
        run_stack(spark, stack)
    # failed statement still at the head for retry
    assert stack.read_text().splitlines()[0].startswith("SELECT * FROM table_that")


def test_step_ledger_resume(tmp_path):
    calls: list[str] = []
    steps = [
        Step("one", lambda: calls.append("one")),
        Step("two", lambda: calls.append("two")),
    ]
    assert run_steps(steps, tmp_path / "ledger") == ["one", "two"]
    assert run_steps(steps, tmp_path / "ledger") == []  # sentinels skip
    assert calls == ["one", "two"]

    archive = archive_ledger(tmp_path / "ledger")
    assert archive is not None and archive.exists()
    assert run_steps(steps, tmp_path / "ledger") == ["one", "two"]  # fresh
    assert archive_ledger(tmp_path / "missing") is None
