"""As-of (temporal) join — match each left row to the most recent right row
at or before its timestamp, per key.

Spark has no native as-of join (pandas-on-Spark's merge_asof exists but
driver-limits options); the scalable formulation here is the classic
union-and-carry-forward trick, NOT a range join:

1. tag right rows 0, left rows 1; union both sides aligned on
   (key, ts, tag, shared payload columns);
2. one window per key ordered by (ts, tag): ``last(right_value,
   ignoreNulls=True)`` carries the latest right payload forward onto every
   subsequent row — right rows sort before left rows at equal ts, giving
   inclusive (ts_right <= ts_left) semantics;
3. keep only left rows.

Cost: ONE shuffle on the key (same as any grouped op) + a per-key sort —
no range-explode, no per-key driver loops, no skew beyond what the key
distribution already has. This is the formulation that survives 100 TB;
a range join would explode, and mapInPandas-per-key would serialize hot
keys. DuckDB's native ASOF JOIN is the oracle.

``tolerance`` optionally nulls matches older than the given interval
(merge_asof-style), applied post-carry with a plain timestamp comparison.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["asof_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    by: list[str],
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row plus the ``value_cols`` of the
    latest ``right`` row with ``right.on <= left.on`` within the same
    ``by`` group (NULLs when no prior right row exists).

    ``on``: ordering timestamp column name (present on both sides);
    ``by``: equi-key column names (present on both sides);
    ``value_cols``: right-side payload columns to attach (prefixed
    ``asof_`` in the output to avoid collisions);
    ``tolerance``: optional SQL interval string (e.g. ``'30 minutes'``) —
    matches older than ``left.on - tolerance`` are nulled out.
    """
    lcols = left.columns
    tagged_left = left.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}")
          for c in value_cols],
        F.struct(*lcols).alias("_lrow"),
    )
    tagged_right = right.select(
        *by,
        F.col(on).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast(tagged_left.schema["_lrow"].dataType).alias("_lrow"),
    )
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_ts").asc(), F.col("_tag").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = tagged_left.unionByName(tagged_right).select(
        "_tag",
        "_lrow",
        "_ts",
        *[
            F.last(f"_rv_{c}", ignorenulls=True).over(w).alias(f"_cv_{c}")
            for c in value_cols
        ],
        *(
            [F.last(F.when(F.col("_tag") == 0, F.col("_ts")),
                    ignorenulls=True).over(w).alias("_rts")]
            if tolerance
            else []
        ),
    )
    out_vals: list[Column] = []
    for c in value_cols:
        v = F.col(f"_cv_{c}")
        if tolerance:
            v = F.when(
                F.col("_rts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}"),
                v,
            )
        out_vals.append(v.alias(f"asof_{c}"))
    return (
        carried.filter(F.col("_tag") == 1)
        .select(*[F.col(f"_lrow.{c}").alias(c) for c in lcols], *out_vals)
    )
