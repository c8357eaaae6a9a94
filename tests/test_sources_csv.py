"""CSV/JSON table loaders: declared-schema reads, FAILFAST vs PERMISSIVE
dead-letter capture, and end-to-end diff over a CSV source."""

from __future__ import annotations

import pytest

from checkatron_spark import diff, diff_summary
from checkatron_spark.sources.tables import load_csv_table, load_json_table


def _write(tmp_path, name, lines):
    p = tmp_path / name
    p.write_text("\n".join(lines) + "\n")
    return str(p)


SCHEMA = "k INT, v STRING, amt DOUBLE"


def test_csv_declared_schema_roundtrip(spark, tmp_path):
    path = _write(tmp_path, "t.csv", ["k,v,amt", "1,a,1.5", "2,b,2.5"])
    df = load_csv_table(spark, path, SCHEMA)
    assert [f.simpleString() for f in df.schema.fields] == [
        "k:int", "v:string", "amt:double"
    ]
    assert {(r.k, r.v, r.amt) for r in df.collect()} == {
        (1, "a", 1.5), (2, "b", 2.5)
    }


def test_csv_failfast_raises_on_bad_row(spark, tmp_path):
    path = _write(tmp_path, "bad.csv", ["k,v,amt", "1,a,1.5", "oops,b,not_a_number"])
    with pytest.raises(Exception):
        load_csv_table(spark, path, SCHEMA).collect()


def test_csv_permissive_quarantines_bad_rows(spark, tmp_path):
    path = _write(tmp_path, "bad.csv", ["k,v,amt", "1,a,1.5", "x,b,nope"])
    # Spark disallows referencing ONLY _corrupt_record on a raw scan —
    # cache the parsed frame first (documented in the loader docstring)
    df = load_csv_table(spark, path, SCHEMA, mode="PERMISSIVE").cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert good.count() == 1 and bad.count() == 1
    assert bad.collect()[0]._corrupt_record == "x,b,nope"


def test_json_declared_schema(spark, tmp_path):
    path = _write(
        tmp_path, "t.jsonl",
        ['{"k": 1, "v": "a", "amt": 1.5}', '{"k": 2, "v": "b", "amt": 2.5}'],
    )
    df = load_json_table(spark, path, SCHEMA)
    assert {(r.k, r.v, r.amt) for r in df.collect()} == {
        (1, "a", 1.5), (2, "b", 2.5)
    }


def test_diff_over_csv_sources(spark, tmp_path):
    before = load_csv_table(
        spark, _write(tmp_path, "b.csv", ["k,v,amt", "1,a,1.0", "2,b,2.0"]), SCHEMA
    )
    after = load_csv_table(
        spark, _write(tmp_path, "a.csv", ["k,v,amt", "1,a,1.0", "2,b,9.0"]), SCHEMA
    )
    s = diff_summary(diff(before, after, ["k"])).collect()[0]
    assert (s.total_rows, s.changed_rows) == (2, 1)
