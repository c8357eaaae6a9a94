"""Incremental view maintenance: keep a count/sum aggregate materialization
current under a CDC changefeed without rescanning the base table.

The reference compares whole snapshots; its summary layer re-aggregates the
full diff result every run (/root/reference/tools/step_ledger.py:253-259). At
100 TB the aggregate-of-interest (counts, sums by a dimension) should instead
be *maintained*: each changefeed row contributes +1/(+value) for its after
image and retracts -1/(-value) for its before image, and the adjustment join
touches only churned groups.

Cost ∝ churn, twice over: the adjustment aggregation shuffles delta rows
(churn-sized), and the merge is a full-outer join between the (small) view
and the (smaller) per-group adjustments — broadcastable on either side. The
100 TB base table is never read.

Only self-maintainable aggregates are expressible this way — COUNT and SUM
(and things derivable from them: AVG, integer-cents money metrics). MIN/MAX
are not: a retraction below the current extremum forces a rescan of the
group. That restriction is structural (classic IVM theory), not an
implementation shortcut.

Requires the changefeed to carry before-images:
``compact_delta(..., include_before=True)``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from checkatron_spark.operators.patch import OP_DELETE, OP_INSERT, OP_UPDATE

__all__ = ["sum_view", "maintain_sum_view"]


def sum_view(
    base: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    *,
    count_col: str = "n_rows",
) -> DataFrame:
    """Materialize the view shape ``maintain_sum_view`` keeps current:
    per-group COUNT(*) plus SUM of each ``sum_cols`` (NULLs contribute 0,
    so sums stay non-null and retraction arithmetic is exact)."""
    return base.groupBy(*group_keys).agg(
        F.count(F.lit(1)).alias(count_col),
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0))).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def maintain_sum_view(
    view: DataFrame,
    delta: DataFrame,
    group_keys: list[str],
    sum_cols: list[str],
    *,
    count_col: str = "n_rows",
) -> DataFrame:
    """Apply a before-image-carrying changefeed to a ``sum_view``
    materialization; returns the view as it would be if recomputed over the
    new snapshot (the oracle identity, hash-checked by the driver).

    Per delta row: 'I'/'U' contribute (+1, +after values) under the AFTER
    group key; 'U'/'D' retract (-1, -before values) under the BEFORE group
    key — an update that moves a row across groups adjusts both. Groups
    whose maintained count reaches zero are dropped (they no longer exist
    in the recomputed view)."""
    zero = F.lit(0)

    plus = delta.filter(F.col("_op").isin(OP_INSERT, OP_UPDATE)).select(
        *[F.col(k).alias(k) for k in group_keys],
        F.lit(1).alias("_dn"),
        *[F.coalesce(F.col(c), zero).alias(f"_dv_{c}") for c in sum_cols],
    )
    minus = delta.filter(F.col("_op").isin(OP_UPDATE, OP_DELETE)).select(
        *[F.col(f"_b_{k}").alias(k) for k in group_keys],
        F.lit(-1).alias("_dn"),
        *[(-F.coalesce(F.col(f"_b_{c}"), zero)).alias(f"_dv_{c}") for c in sum_cols],
    )
    adj = (
        plus.unionByName(minus)
        .groupBy(*group_keys)
        .agg(
            F.sum("_dn").alias("_adj_n"),
            *[F.sum(f"_dv_{c}").alias(f"_adj_{c}") for c in sum_cols],
        )
    )

    v = view.select(
        *[F.col(k).alias(f"v_{k}") for k in group_keys],
        F.col(count_col).alias("_v_n"),
        *[F.col(f"sum_{c}").alias(f"_v_{c}") for c in sum_cols],
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"v_{k}").eqNullSafe(adj[k]) for k in group_keys],
    )
    merged = v.join(adj, cond, "full_outer")
    new_n = F.coalesce(F.col("_v_n"), zero) + F.coalesce(F.col("_adj_n"), zero)
    return (
        merged.select(
            *[
                F.coalesce(F.col(f"v_{k}"), adj[k]).alias(k)
                for k in group_keys
            ],
            new_n.alias(count_col),
            *[
                (
                    F.coalesce(F.col(f"_v_{c}"), zero)
                    + F.coalesce(F.col(f"_adj_{c}"), zero)
                ).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .filter(F.col(count_col) > 0)
    )
