"""Schema-descriptor CSV ingestion and export (reference parity S1/S2/S4/S10).

The reference consumes CSV exports of Snowflake's ``DESCRIBE TABLE`` — header
``name,type,kind,null?,default,primary key,unique key,check,expression,
comment,policy name,privacy domain`` (reference samples/example_before.csv:1,
loader at diffgen.py:30-34) — and a keys CSV in the same format holding only
the business-key rows (diffgen.py:54-55). Table names are inferred from the
CSV filename, ``a_b.csv`` -> ``a.b``, overridable (diffgen.py:86-94).

Spark-first mapping: descriptors become ``StructType`` (warehouse type
strings -> Spark types, with the extra DESCRIBE columns preserved in field
metadata), and ``export_schema_csv`` round-trips ``df.schema`` back to the
same CSV shape (reference tools/step_ledger.py:200-221). Parsing stays
driver-side — schema files are tiny metadata, not data.
"""

from __future__ import annotations

import csv
import re
from pathlib import Path

from pyspark.sql.types import (
    BooleanType,
    DataType,
    DateType,
    DecimalType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

__all__ = [
    "DESCRIBE_HEADER",
    "export_schema_csv",
    "infer_table_name",
    "load_keys_csv",
    "load_schema_csv",
    "schema_to_struct",
    "struct_to_rows",
    "warehouse_type_to_spark",
]

DESCRIBE_HEADER = [
    "name", "type", "kind", "null?", "default", "primary key",
    "unique key", "check", "expression", "comment", "policy name",
    "privacy domain",
]

_NUMBER_RE = re.compile(r"^NUMBER\s*\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)$", re.I)
_VARCHAR_RE = re.compile(r"^(?:VARCHAR|CHAR|STRING|TEXT)(?:\s*\(\s*\d+\s*\))?$", re.I)


def load_schema_csv(path: str | Path) -> list[dict[str, str]]:
    """S1: parse a DESCRIBE-TABLE CSV into a list of column descriptors."""
    with Path(path).open(newline="") as f:
        return list(csv.DictReader(f))


def load_keys_csv(path: str | Path) -> list[str]:
    """S2: the keys CSV (same header, only key rows) -> upper-cased names."""
    return [row["name"].upper() for row in load_schema_csv(path)]


def infer_table_name(path: str | Path, override: str | None = None) -> str:
    """S4: ``db_schema_table.csv`` -> ``db.schema.table`` unless overridden."""
    if override:
        return override
    return Path(path).stem.replace("_", ".")


def warehouse_type_to_spark(type_str: str) -> DataType:
    """Map a warehouse DESCRIBE type string to a Spark type.

    Richer than the reference's two-value TEXT/NUMBER lattice
    (diffgen.py:37-47) because Spark comparisons are typed: NUMBER(p,s) ->
    Decimal(p,s), bare NUMBER -> Decimal(38,0) (Snowflake's default),
    integer synonyms -> Long, FLOAT/DOUBLE -> Double.
    """
    t = type_str.strip().upper()
    m = _NUMBER_RE.match(t)
    if m:
        prec, scale = int(m.group(1)), int(m.group(2) or 0)
        return DecimalType(prec, scale)
    if t in {"NUMBER", "NUMERIC", "DECIMAL"}:
        return DecimalType(38, 0)
    if t in {"INT", "INTEGER", "BIGINT", "SMALLINT", "TINYINT", "BYTEINT"}:
        return LongType()
    if t in {"FLOAT", "FLOAT4", "FLOAT8", "DOUBLE", "DOUBLE PRECISION", "REAL"}:
        return DoubleType()
    if t == "BOOLEAN":
        return BooleanType()
    if t == "DATE":
        return DateType()
    if t.startswith("TIMESTAMP") or t == "DATETIME":
        return TimestampType()
    if _VARCHAR_RE.match(t):
        return StringType()
    return StringType()  # fallback mirrors the reference's TEXT fallback


def schema_to_struct(rows: list[dict[str, str]]) -> StructType:
    """Descriptor rows -> StructType; extra DESCRIBE columns ride along in
    field metadata so a round-trip loses nothing."""
    fields = []
    for row in rows:
        meta = {k: v for k, v in row.items() if k not in {"name", "type"} and v}
        fields.append(
            StructField(
                row["name"].upper(),
                warehouse_type_to_spark(row["type"]),
                nullable=row.get("null?", "").upper() != "N",
                metadata=meta,
            )
        )
    return StructType(fields)


def _spark_type_to_warehouse(dt: DataType) -> str:
    if isinstance(dt, DecimalType):
        return f"NUMBER({dt.precision},{dt.scale})"
    name = dt.simpleString().upper()
    return {
        "BIGINT": "NUMBER(38,0)", "INT": "NUMBER(38,0)",
        "SMALLINT": "NUMBER(38,0)", "TINYINT": "NUMBER(38,0)",
        "DOUBLE": "FLOAT", "FLOAT": "FLOAT",
        "STRING": "VARCHAR", "DATE": "DATE", "BOOLEAN": "BOOLEAN",
    }.get(name, "TIMESTAMP" if name.startswith("TIMESTAMP") else "VARCHAR")


def struct_to_rows(schema: StructType) -> list[dict[str, str]]:
    """``df.schema`` -> DESCRIBE-shaped rows (inverse of schema_to_struct)."""
    rows = []
    for f in schema.fields:
        row = {h: "" for h in DESCRIBE_HEADER}
        row["name"] = f.name.upper()
        row["type"] = _spark_type_to_warehouse(f.dataType)
        row["null?"] = "Y" if f.nullable else "N"
        for k, v in (f.metadata or {}).items():
            if k in row and not row[k]:
                row[k] = str(v)
        rows.append(row)
    return rows


def export_schema_csv(schema: StructType, path: str | Path) -> None:
    """S10: write a DataFrame schema as a DESCRIBE-TABLE CSV round-trippable
    through :func:`load_schema_csv`/" :func:`schema_to_struct`."""
    with Path(path).open("w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=DESCRIBE_HEADER)
        w.writeheader()
        w.writerows(struct_to_rows(schema))
