"""End-to-end parity with the reference's published portfolio sample
(reference README.md:108-143 data, :199-203 expected results; BASELINE.md
functional rows). Key = (ACCOUNT_ID, PORTFOLIO_NAME, VALUATION_DATE).

(The copy of this sample in samples/setup_all.sql:40 carries a data-entry
typo — VALUATION_DATE '202401-01' on row 1005 — that contradicts both the
README data and the published expected counts; the README version is the
canonical one.)"""

from __future__ import annotations

from datetime import date

import pytest
from pyspark.sql import functions as F

from checkatron_spark import decode_status, diff, diff_summary

D = date(2024, 1, 1)

BEFORE = [
    (1001, "PORTFOLIO_A", D, 10000.00, "ACTIVE"),
    (1002, "PORTFOLIO_B", D, 25000.50, "ACTIVE"),
    (1003, "PORTFOLIO_A", D, 5000.75, "SUSPENDED"),
    (1004, "PORTFOLIO_C", D, 15000.25, "ACTIVE"),
    (1005, "PORTFOLIO_B", D, 30000.00, "ACTIVE"),
]
AFTER = [
    (1001, "PORTFOLIO_A", D, 10000.00, "ACTIVE", 100.00),
    (1002, "PORTFOLIO_B", D, 25000.50, "ACTIVE", 200.00),
    (1003, "PORTFOLIO_A", D, 5000.75, "ACTIVE", 150.00),
    (1004, "PORTFOLIO_C", D, 15000.25, "ACTIVE", 300.00),
    (1005, "PORTFOLIO_B", D, 35000.00, "ACTIVE", 400.00),
    (1006, "PORTFOLIO_D", D, 7500.00, "ACTIVE", 500.00),
]
B_COLS = ["account_id", "portfolio_name", "valuation_date", "balance", "status"]
A_COLS = B_COLS + ["new_column"]
KEYS = ["account_id", "portfolio_name", "valuation_date"]


@pytest.fixture(scope="module")
def result(spark):
    before = spark.createDataFrame(BEFORE, B_COLS)
    after = spark.createDataFrame(AFTER, A_COLS)
    return diff(before, after, KEYS)


def test_published_counts(result):
    # reference README.md:199-203: 6 total, 2 changed, 1 missing-in-before.
    # NEW_COLUMN is a schema-drift column (status 2 on every row), so it is
    # excluded from the changed-row predicate — the published "2 rows with
    # differences" counts only genuine value changes (1003, 1005).
    s = diff_summary(result, exclude=["NEW_COLUMN"]).collect()[0]
    assert s.total_rows == 6
    assert s.missing_in_before == 1
    assert s.missing_in_after == 0
    assert s.matched_rows == 5
    assert s.changed_rows == 2


def test_per_row_statuses(result):
    rows = {r.K_ACCOUNT_ID: r for r in result.collect()}
    assert rows[1003].STATUS == 1 and rows[1003].BALANCE == 0
    assert rows[1005].BALANCE == 1 and rows[1005].STATUS == 0
    for k in (1001, 1002, 1004):
        assert rows[k].STATUS == 0 and rows[k].BALANCE == 0
        assert rows[k]._row_status is None
    assert rows[1006]._row_status == 4
    # NEW_COLUMN: status 2 (NULL in before only) for ALL six rows
    assert all(rows[k].NEW_COLUMN == 2 for k in rows)
    # missing row: every value column reports 2
    assert rows[1006].BALANCE == 2 and rows[1006].STATUS == 2


def test_decode_labels(result):
    decoded = {
        (r.K_ACCOUNT_ID): r.STATUS_label
        for r in decode_status(result, "STATUS").collect()
    }
    assert decoded[1003] == "DIFFERENT"
    assert decoded[1001] == "MATCH"
    assert decoded[1006] == "NULL_IN_BEFORE"


def test_verification_query_shape(spark, result):
    # the reference's verification display: UNION ALL of labeled sides
    # ordered by account id (README.md:136-143)
    before = spark.createDataFrame(BEFORE, B_COLS)
    after = spark.createDataFrame(AFTER, A_COLS).drop("new_column")
    stacked = (
        before.withColumn("source", F.lit("BEFORE"))
        .unionByName(after.withColumn("source", F.lit("AFTER")))
        .orderBy("account_id", "source")
    )
    assert stacked.count() == 11
