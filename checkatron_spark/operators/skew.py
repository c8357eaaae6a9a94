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

__all__ = ["salted_agg", "salted_join", "with_salt"]


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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    *,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi join by salting: the (big, skewed) ``left`` side gets
    a content-derived salt in [0, buckets); the (smaller) ``right`` side is
    replicated once per salt value; the join runs on (keys..., salt), so the
    hot key's rows spread over ``buckets`` reducers instead of melting one.

    Result is identical to ``left.join(right, on, how)``. Only inner and
    left joins are expressible (replicating the right side would duplicate
    its unmatched rows under right/full outer) — a structural restriction.
    Use when the right side is too big to broadcast but ``buckets``-fold
    replication is still cheap; the replication factor is the explicit cost
    knob. AQE's skew-split covers most sort-merge cases at runtime; this is
    the deterministic fallback for planned-ahead hot keys."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    lt = with_salt(left, buckets)
    # sequence endpoints as bigint so the salt matches pmod(xxhash64)'s type
    # (a generator can't be wrapped in a cast expression)
    rt = right.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), F.lit(buckets - 1).cast("bigint"))
        ),
    )
    return lt.join(rt, on + ["_salt"], how).drop("_salt")
