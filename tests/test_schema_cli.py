"""Schema-CSV ingestion/export and CLI parity (SURVEY.md S1/S2/S4/S10, G4).

The CLI's rendered SQL is executed in DuckDB (the reference's own test
strategy, tests/test_diffgen.py:39-52) to pin that the generated artifact is
runnable, not just well-formed.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql.types import DecimalType, DoubleType, LongType, StringType

from checkatron_spark import cli
from checkatron_spark.sources import schema_csv as SC

DESCRIBE = (
    "name,type,kind,null?,default,primary key,unique key,check,expression,"
    "comment,policy name,privacy domain\n"
)


@pytest.fixture
def csv_dir(tmp_path):
    (tmp_path / "db_sch_before.csv").write_text(
        DESCRIBE
        + "ACCOUNT_ID,NUMBER,,N,,Y,,,,,,\n"
        + "NAME,VARCHAR(50),,,,,,,,,,\n"
        + "BALANCE,\"NUMBER(15,2)\",,,,,,,,,,\n"
    )
    (tmp_path / "db_sch_after.csv").write_text(
        DESCRIBE
        + "ACCOUNT_ID,NUMBER,,N,,Y,,,,,,\n"
        + "NAME,VARCHAR(50),,,,,,,,,,\n"
        + "BALANCE,\"NUMBER(15,2)\",,,,,,,,,,\n"
        + "NEW_COLUMN,VARCHAR,,,,,,,,,,\n"
    )
    (tmp_path / "keys.csv").write_text(DESCRIBE + "ACCOUNT_ID,NUMBER,,,,,,,,,,\n")
    return tmp_path


def test_schema_csv_types(csv_dir):
    rows = SC.load_schema_csv(csv_dir / "db_sch_before.csv")
    struct = SC.schema_to_struct(rows)
    types = {f.name: f.dataType for f in struct.fields}
    assert types["ACCOUNT_ID"] == DecimalType(38, 0)
    assert types["NAME"] == StringType()
    assert types["BALANCE"] == DecimalType(15, 2)
    assert not struct["ACCOUNT_ID"].nullable
    assert struct["ACCOUNT_ID"].metadata.get("primary key") == "Y"


def test_warehouse_type_lattice():
    assert SC.warehouse_type_to_spark("INT") == LongType()
    assert SC.warehouse_type_to_spark("FLOAT8") == DoubleType()
    assert SC.warehouse_type_to_spark("text") == StringType()
    assert SC.warehouse_type_to_spark("GEOGRAPHY") == StringType()  # fallback


def test_schema_roundtrip(csv_dir, tmp_path):
    struct = SC.schema_to_struct(SC.load_schema_csv(csv_dir / "db_sch_before.csv"))
    out = tmp_path / "exported.csv"
    SC.export_schema_csv(struct, out)
    again = SC.schema_to_struct(SC.load_schema_csv(out))
    assert [(f.name, f.dataType, f.nullable) for f in again.fields] == [
        (f.name, f.dataType, f.nullable) for f in struct.fields
    ]


def test_table_name_inference(csv_dir):
    assert SC.infer_table_name(csv_dir / "db_sch_before.csv") == "db.sch.before"
    assert SC.infer_table_name(csv_dir / "db_sch_before.csv", "X.Y.Z") == "X.Y.Z"


def test_keys_csv(csv_dir):
    assert SC.load_keys_csv(csv_dir / "keys.csv") == ["ACCOUNT_ID"]


def test_cli_renders_runnable_sql(csv_dir, tmp_path):
    out = tmp_path / "diff.sql"
    stack = tmp_path / "stack.sql"
    stack.write_text("SELECT 1;\n")
    rc = cli.main(
        [
            str(csv_dir / "db_sch_before.csv"),
            str(csv_dir / "db_sch_after.csv"),
            "--keys", str(csv_dir / "keys.csv"),
            "--before_table", "before_t",
            "--after_table", "after_t",
            "--out", str(out),
            "--single_line",
            "--stack_input", str(stack),
        ]
    )
    assert rc == 0
    sql = out.read_text()
    assert "CREATE OR REPLACE TABLE diff_result AS" in sql
    assert "\n" in sql.strip()  # --out keeps the multi-line form

    # stack got the single-line form, existing entries preserved (FIFO)
    lines = stack.read_text().splitlines()
    assert lines[0] == "SELECT 1;"
    assert len(lines) == 2 and "CREATE OR REPLACE TABLE" in lines[1]
    assert "--" not in lines[1]

    # the rendered artifact actually runs (DuckDB, reference test strategy)
    con = duckdb.connect(":memory:")
    con.execute("CREATE TABLE before_t AS SELECT 1 AS account_id, 'x' AS name, "
                "10.00 AS balance")
    con.execute("CREATE TABLE after_t AS SELECT 1 AS account_id, 'y' AS name, "
                "10.00 AS balance, 'n' AS new_column")
    con.execute(sql)
    row = con.execute(
        'SELECT "_row_status", "NAME", "NEW_COLUMN", "BALANCE" FROM diff_result'
    ).fetchone()
    assert row == (None, 1, 2, 0)  # matched row; NAME differs; drift col NULL-in-before


def test_cli_execute_on_spark(spark, csv_dir, tmp_path):
    before = spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 5.0)], ["account_id", "name", "balance"]
    )
    after = spark.createDataFrame(
        [(1, "x", 11.0), (3, "z", 7.0)], ["account_id", "name", "balance"]
    )
    bp, ap = str(tmp_path / "b.parquet"), str(tmp_path / "a.parquet")
    before.write.parquet(bp)
    after.write.parquet(ap)
    rc = cli.main(
        [
            str(csv_dir / "db_sch_before.csv"),
            str(csv_dir / "db_sch_after.csv"),
            "--keys", str(csv_dir / "keys.csv"),
            "--out", str(tmp_path / "d.sql"),
            "--execute",
            "--before_path", bp,
            "--after_path", ap,
            "--temp_view",
        ]
    )
    assert rc == 0
    got = {r.K_ACCOUNT_ID: r for r in spark.table("diff_result").collect()}
    assert got[1]._row_status is None and got[1].BALANCE == 1
    assert got[2]._row_status == 5 and got[3]._row_status == 4
