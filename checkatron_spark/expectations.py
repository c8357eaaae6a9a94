"""Declarative data-quality expectation suites — one scan, every check.

The Great-Expectations-style contract surface a pipeline runs before
publishing a snapshot: a list of declarative constraints (not-null,
unique, value range, accepted set, regex shape) compiled into a SINGLE
aggregate pass over the table. Each expectation contributes one or two
``count_if`` style aggregates to the same ``groupBy().agg(...)``, so a
suite of 50 checks over a 100 TB table costs exactly one scan + one
1-row aggregation — never one job per check (the naive loop that makes
expectation suites unaffordable at scale). The wide 1-row result is then
``stack``-ed into the per-expectation report a CI gate consumes.

``unique`` rides ``count(col) - count_distinct(col)`` inside the same
aggregation: distinct-count is the one check that genuinely shuffles, and
Spark's partial aggregation keeps it map-side combined like the rest.

All counters are exact integers; ``passed`` is their comparison — nothing
engine-divergent anywhere.

Reference parity note: the reference (simbo1905/checkatron) has no
constraint surface — this extends the diff/drift/guard data-quality lane
(SURVEY §2 P-/G-rows) into the declarative-contract shape modern
pipelines publish alongside datasets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from checkatron_spark.sources.tables import load_table

__all__ = ["expectations_report", "QUERIES", "oracles"]

# an expectation is a tuple: ("not_null", col) | ("unique", col)
# | ("range", col, lo, hi) | ("in_set", col, values) | ("matches", col, re)
Expectation = tuple


def _compile(i: int, exp: Expectation):
    """(violations_agg, checked_agg) column pair for one expectation."""
    kind, col = exp[0], exp[1]
    c = F.col(col)
    checked = F.count(c)  # non-null population for value checks
    if kind == "not_null":
        return F.count_if(c.isNull()), F.count(F.lit(1))
    if kind == "unique":
        return F.count(c) - F.count_distinct(c), F.count(c)
    if kind == "range":
        lo, hi = exp[2], exp[3]
        return (
            F.count_if(c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi)))),
            checked,
        )
    if kind == "in_set":
        return (
            F.count_if(c.isNotNull() & ~c.isin(list(exp[2]))),
            checked,
        )
    if kind == "matches":
        return (
            F.count_if(c.isNotNull() & ~c.rlike(exp[2])),
            checked,
        )
    raise ValueError(f"unknown expectation kind: {kind!r}")


def expectations_report(
    df: DataFrame, expectations: list[Expectation]
) -> DataFrame:
    """Evaluate every expectation in ONE aggregate pass; returns one row
    per expectation: (expectation, column, n_checked, n_violations,
    passed), in suite order via the expectation label."""
    aggs = []
    for i, exp in enumerate(expectations):
        v, c = _compile(i, exp)
        aggs.append(v.cast("bigint").alias(f"_v{i}"))
        aggs.append(c.cast("bigint").alias(f"_c{i}"))
    wide = df.groupBy().agg(*aggs)
    stack_args = ", ".join(
        f"'{exp[0]}', '{exp[1]}', _c{i}, _v{i}"
        for i, exp in enumerate(expectations)
    )
    return wide.selectExpr(
        f"stack({len(expectations)}, {stack_args}) "
        "AS (expectation, column, n_checked, n_violations)"
    ).select(
        "expectation",
        "column",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
    )


_ORDERS_SUITE: list[Expectation] = [
    ("not_null", "o_orderkey"),
    ("not_null", "o_custkey"),
    ("unique", "o_orderkey"),
    ("range", "o_totalprice", 0, 1000000),
    ("in_set", "o_orderstatus", ["O", "F", "P"]),
    ("matches", "o_orderpriority", "^[1-5]-"),
]


def q_expectations_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return expectations_report(
        load_table(spark, "orders", sf_dir), _ORDERS_SUITE
    )


_DOCUMENTS_SUITE: list[Expectation] = [
    ("not_null", "doc_id"),
    ("not_null", "text"),
    ("unique", "doc_id"),
    ("range", "n_chars", 1, 100000),
    ("in_set", "lang", ["en", "es", "de", "fr", "zh"]),
    ("matches", "source", "^src"),
]


def q_expectations_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same single-scan contract engine over the corpus table — the
    pre-publish gate a dataset snapshot runs before it ships."""
    return expectations_report(
        load_table(spark, "documents", sf_dir), _DOCUMENTS_SUITE
    )


def _exp_arm_sql(exp: Expectation, table: str = "orders") -> str:
    kind, col = exp[0], exp[1]
    if kind == "not_null":
        v = f"COUNT(*) FILTER (WHERE {col} IS NULL)"
        c = "COUNT(*)"
    elif kind == "unique":
        v = f"COUNT({col}) - COUNT(DISTINCT {col})"
        c = f"COUNT({col})"
    elif kind == "range":
        lo, hi = exp[2], exp[3]
        v = (
            f"COUNT(*) FILTER (WHERE {col} IS NOT NULL "
            f"AND ({col} < {lo} OR {col} > {hi}))"
        )
        c = f"COUNT({col})"
    elif kind == "in_set":
        vals = ", ".join(f"'{x}'" for x in exp[2])
        v = (
            f"COUNT(*) FILTER (WHERE {col} IS NOT NULL "
            f"AND {col} NOT IN ({vals}))"
        )
        c = f"COUNT({col})"
    elif kind == "matches":
        v = (
            f"COUNT(*) FILTER (WHERE {col} IS NOT NULL "
            f"AND NOT regexp_matches({col}, '{exp[2]}'))"
        )
        c = f"COUNT({col})"
    else:  # pragma: no cover
        raise ValueError(kind)
    return (
        f"SELECT '{exp[0]}' AS expectation, '{col}' AS \"column\", "
        f"CAST({c} AS BIGINT) AS n_checked, "
        f"CAST({v} AS BIGINT) AS n_violations, "
        f"({v}) = 0 AS passed FROM {table}"
    )


def expectations_orders_sql() -> str:
    return "\nUNION ALL\n".join(_exp_arm_sql(e) for e in _ORDERS_SUITE)


def expectations_documents_sql() -> str:
    return "\nUNION ALL\n".join(
        _exp_arm_sql(e, table="documents") for e in _DOCUMENTS_SUITE
    )


QUERIES = {
    "expectations_orders": q_expectations_orders,
    "expectations_documents": q_expectations_documents,
}


def oracles() -> dict[str, str]:
    return {
        "expectations_orders": expectations_orders_sql(),
        "expectations_documents": expectations_documents_sql(),
    }
