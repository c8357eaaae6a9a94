"""Snapshot drift profile: column-level statistics compared WITHOUT a row
join — the constant-cost companion to the row diff.

The reference's diff (and ours) answers "which rows changed"; at 100 TB the
first question is usually the cheaper "did this column's distribution move?"
— count, null rate, sum, min, max per column, before vs after. This operator
computes both sides' profiles in ONE aggregate pass each (2 scans total,
each reduced map-side to a single row), reshapes to one row per column, and
aligns sides by conditional aggregation — NO join anywhere, so the plan
holds at any scale and the output is ~n_columns rows regardless of input
size.

Exactness: sums ride ``floor(x*scale+0.5)`` integers (scale 100 = cents), so
they are order-independent and bit-identical across engines/partitionings —
the same trick the money aggregates use. A drifted column shows up as any
unequal (n, nulls, sum, min, max) pair; row-level investigation then runs
the (incremental) diff on just that finding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["drift_profile"]


def _side_profile(df: DataFrame, specs: dict[str, float], side: str) -> DataFrame:
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, scale in specs.items():
        scaled = F.floor(
            F.col(c).cast("double") * F.lit(float(scale)) + F.lit(0.5)
        ).cast("bigint")
        aggs += [
            F.count_if(F.col(c).isNull()).alias(f"nulls_{c}"),
            F.sum(scaled).alias(f"sum_{c}"),
            # min/max ride the same scaled-BIGINT lane as the sums:
            # floor(x*scale+0.5) is monotonic, so min(scaled) == scaled(min),
            # and integer outputs are bit-identical across engines (raw
            # doubles are not — cross-engine float rendering differs)
            F.min(scaled).alias(f"min_{c}"),
            F.max(scaled).alias(f"max_{c}"),
        ]
    wide = df.groupBy().agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', nulls_{c}, sum_{c}, min_{c}, max_{c}" for c in specs
    )
    return wide.selectExpr(
        f"stack({len(specs)}, {stack_args}) AS "
        "(column_name, n_nulls, sum_scaled, min_v, max_v)",
        "n_rows",
    ).withColumn("side", F.lit(side))


def drift_profile(
    before: DataFrame, after: DataFrame, specs: dict[str, float]
) -> DataFrame:
    """One row per column in ``specs`` (col -> sum scale factor; 100 for
    2-decimal money, 1 for integers) with before/after count, null count,
    exact scaled sum, min, max. Join-free: union of two single-row
    aggregates + conditional agg on the side tag."""
    u = _side_profile(before, specs, "b").unionByName(
        _side_profile(after, specs, "a")
    )

    def pick(side: str, col: str):
        return F.max(F.when(F.col("side") == side, F.col(col)))

    return u.groupBy("column_name").agg(
        pick("b", "n_rows").alias("n_before"),
        pick("a", "n_rows").alias("n_after"),
        pick("b", "n_nulls").alias("nulls_before"),
        pick("a", "n_nulls").alias("nulls_after"),
        pick("b", "sum_scaled").alias("sum_before"),
        pick("a", "sum_scaled").alias("sum_after"),
        pick("b", "min_v").alias("min_before"),
        pick("a", "min_v").alias("min_after"),
        pick("b", "max_v").alias("max_before"),
        pick("a", "max_v").alias("max_after"),
    )
