"""Parquet table loaders for the shared test fixtures (/root/repo/TESTDATA.md)
and the table-scan / sink surface of the reference (SURVEY.md S3/S5/S6).

At 100 TB these scans are the dominant cost: loaders keep plans declarative so
Catalyst pushes filters and prunes columns down to the parquet reader
(check ``.explain``: PushedFilters / ReadSchema).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Table scan (S3): ``spark.read.parquet`` — self-describing schema,
    column-pruned, filter-pushed.

    ``events.ts`` is written as TIMESTAMP(NANOS), which Spark reads as a
    nanosecond LongType (spark.sql.legacy.parquet.nanosAsLong); convert to a
    microsecond timestamp (sub-microsecond parts are zero in the fixtures).
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` queries
    can reference them by name (mirrors DuckDB oracle view registration)."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def save_diff_result(
    df: DataFrame, table: str = "diff_result", *, temporary: bool = False
) -> None:
    """CTAS sink (S5) / temp-table variant (S6):
    ``CREATE OR REPLACE [TEMPORARY] TABLE diff_result AS ...``
    (full_compare.sql.j2:10, tools/step_ledger.py:161-164)."""
    if temporary:
        df.createOrReplaceTempView(table)
    else:
        df.write.mode("overwrite").saveAsTable(table)
