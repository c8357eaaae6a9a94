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

    ``events.ts`` has shipped under two parquet encodings; normalize both to
    a session-zone ``TimestampType`` so downstream epoch arithmetic and
    Structured Streaming watermarks (which reject TIMESTAMP_NTZ) always see
    the same type:

    - TIMESTAMP(NANOS) → Spark reads a nanosecond LongType
      (spark.sql.legacy.parquet.nanosAsLong); convert via timestamp_micros.
    - timestamp[us] without a UTC flag → Spark reads TIMESTAMP_NTZ; cast to
      TIMESTAMP (session tz is UTC, so wall-clock values are unchanged).

    The NTZ cast covers every timestamp_ntz column of ``events`` (the only
    table that feeds watermarks), not just ``ts`` — the fixtures are
    regenerated per round and have already flipped parquet timestamp
    encodings once. Other tables keep their fixture dtypes on purpose:
    nothing downstream needs the cast there, and dtype churn would
    invalidate the value-hash baselines already proven green.
    """
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        for col, dtype in df.dtypes:
            if dtype == "timestamp_ntz":
                df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def _with_corrupt_field(schema):
    """Spark only CAPTURES corrupt records when the read schema contains the
    corrupt-record column — append it if missing (PERMISSIVE mode only)."""
    from pyspark.sql.types import StringType, StructField, StructType

    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if "_corrupt_record" not in schema.fieldNames():
        schema = StructType(
            schema.fields + [StructField("_corrupt_record", StringType(), True)]
        )
    return schema


def load_csv_table(
    spark: SparkSession,
    path: str,
    schema,
    *,
    header: bool = True,
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan with a DECLARED schema (never inferSchema — inference reads
    the data twice and can silently flip types between runs, which at 100 TB
    is both a full extra pass and a correctness hazard). ``schema`` is a
    StructType or DDL string (pairs with
    ``sources.schema_csv.schema_to_struct`` for reference DESCRIBE-CSV
    files). ``mode``: FAILFAST surfaces bad rows immediately (default);
    PERMISSIVE quarantines them into ``_corrupt_record`` for a dead-letter
    filter instead of failing the job (Spark requires ``.cache()`` on the
    parsed frame before a filter that references only ``_corrupt_record``)."""
    if mode.upper() == "PERMISSIVE":
        schema = _with_corrupt_field(schema)
    reader = (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", mode)
    )
    if mode.upper() == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.csv(path)


def load_json_table(
    spark: SparkSession, path: str, schema, *, mode: str = "FAILFAST"
) -> DataFrame:
    """JSON-lines scan with a declared schema (same no-inference rationale
    as ``load_csv_table``; nested structs/arrays come through typed)."""
    if mode.upper() == "PERMISSIVE":
        schema = _with_corrupt_field(schema)
    reader = spark.read.schema(schema).option("mode", mode)
    if mode.upper() == "PERMISSIVE":
        reader = reader.option("columnNameOfCorruptRecord", "_corrupt_record")
    return reader.json(path)


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


def non_matching(diff_df: DataFrame) -> DataFrame:
    """Rows with any difference: missing on a side, or any status column
    > 0. At 100 TB the interesting rows are typically <<1% of the diff —
    persist only these (the predicate stays in whole-stage codegen)."""
    status_cols = [
        c for c in diff_df.columns
        if c != "_row_status" and not c.startswith("K_")
    ]
    any_diff = F.greatest(*[F.col(f"`{c}`") for c in status_cols]) > 0
    return diff_df.filter(F.col("_row_status").isNotNull() | any_diff)


def write_differences_only(
    diff_df: DataFrame, path: str, *, partition_by: list[str] | None = None
) -> None:
    """Differences-only parquet sink: the scale-friendly alternative to
    materializing the full diff (matched rows carry no information a
    summary can't recompute)."""
    w = non_matching(diff_df).write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    *,
    sort_by: list[str] | None = None,
) -> None:
    """Hive-partitioned parquet layout — the 100 TB table organization.

    Partition columns become directories, so a filter on them prunes whole
    directories BEFORE any IO (static partition pruning; joins prune
    dynamically). ``sort_by`` sorts within files so parquet row-group
    min/max stats also skip pages for range filters on those columns.
    Date-sliced diffs (reference README.md:288-291 recommends date-bounded
    comparisons) become partition-pruned scans under this layout."""
    w = df
    if sort_by:
        w = w.sortWithinPartitions(*sort_by)
    w.write.mode("overwrite").partitionBy(*partition_by).parquet(path)


def compact_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    *,
    target_file_mb: int = 256,
    sort_by: list[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet dataset into
    ~``target_file_mb`` files (computed from the source's on-disk bytes),
    optionally sorted for row-group stat locality. Streaming sinks and
    incremental loads accumulate kilobyte files whose per-file open/footer
    cost dominates scans at scale; compaction is the standing maintenance
    job. Returns the file count written."""
    import math
    from pathlib import Path

    total = sum(
        p.stat().st_size for p in Path(src_path).rglob("*.parquet")
    ) or Path(src_path).stat().st_size
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(src_path)
    out = df.repartition(n_files)
    if sort_by:
        out = out.sortWithinPartitions(*sort_by)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files


def _nullsafe_sentinel(dt):
    """A non-NULL default of the key's type for the coalesced bucket
    column. Any constant works — equality on the (value, isnull) PAIR is
    what implements ``<=>``, the sentinel only has to be non-NULL so plain
    ``=`` never returns NULL."""
    s = dt.simpleString()
    if s == "string" or s.startswith("varchar") or s.startswith("char"):
        return F.lit("")
    if s == "boolean":
        return F.lit(False)
    if s == "date":
        return F.lit("1970-01-01").cast("date")
    if s.startswith("timestamp"):
        return F.lit("1970-01-01 00:00:00").cast(s)
    if s in ("tinyint", "smallint", "int", "bigint", "float", "double") or (
        s.startswith("decimal")
    ):
        return F.lit(0).cast(dt)
    raise ValueError(
        f"null-safe bucketing needs an atomic key type, got {s!r} — "
        "cast the key or bucket with null_safe=False"
    )


def nullsafe_key_cols(keys: list[str]) -> list[str]:
    """The interleaved materialized column names ``with_nullsafe_keys``
    adds for ``keys`` — also the bucket/sort spec order."""
    out: list[str] = []
    for k in keys:
        out += [f"__nsb_{k}", f"__nsn_{k}"]
    return out


def with_nullsafe_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Materialize, per key, ``__nsb_<k> = coalesce(k, sentinel)`` and
    ``__nsn_<k> = isnull(k)``. Plain ``=`` on the (``__nsb``, ``__nsn``)
    pair is EXACTLY ``k <=> k``: both-NULL rows agree on (sentinel, true);
    a real sentinel value disagrees on the isnull flag; non-NULLs compare
    normally — and because both columns are non-NULL physical columns,
    they can carry a bucket spec, which ``<=>`` itself never can (Spark
    compiles it to composite expressions that match no bucketing).
    ``diff()`` recognizes the ``__nsb_``/``__nsn_`` prefix, joins on these
    columns under ``null_safe_keys=True``, and excludes them from the
    compared column universe (output hash unchanged)."""
    out = df
    for k in keys:
        dt = df.schema[k].dataType
        out = out.withColumn(
            f"__nsb_{k}", F.coalesce(F.col(k), _nullsafe_sentinel(dt))
        ).withColumn(f"__nsn_{k}", F.col(k).isNull())
    return out


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int = 32,
    *,
    null_safe: bool = False,
) -> None:
    """Persist a table bucketed+sorted by the diff keys. Two tables saved
    with the same spec diff with ZERO exchanges: the sort-merge join reads
    co-located buckets directly (verified in tests by asserting no Exchange
    in the physical plan). This is the 100 TB repeated-diff strategy —
    shuffle each snapshot once at write time, never again at read time.

    ``null_safe=True`` (VERDICT r6 item 5) buckets on materialized
    ``(coalesce(key, sentinel), isnull(key))`` columns instead
    (:func:`with_nullsafe_keys`), so the DEFAULT null-safe diff is also
    exchange-free on re-diffs — ``<=>`` itself can never match a bucket
    spec. ``null_safe=False`` keeps the plain spec, which only the
    ``null_safe_keys=False`` diff can use."""
    if null_safe:
        df = with_nullsafe_keys(df, keys)
        cols = nullsafe_key_cols(keys)
    else:
        cols = keys
    (
        df.write.mode("overwrite")
        .bucketBy(buckets, cols[0], *cols[1:])
        .sortBy(cols[0], *cols[1:])
        .saveAsTable(table)
    )
