"""CDC patch operators: compact change-delta between snapshots, and delta apply.

The reference's diff answers "what changed" as a *wide status report* — one
status column per compared column (/root/reference/checkatron/templates/
full_compare.sql.j2:67-86). The natural next consumer at warehouse scale is a
*compact changefeed*: one row per changed key carrying the surviving values
plus an op code, which is what replication / incremental-materialization
systems ship instead of full snapshots. ``compact_delta`` produces that feed;
``apply_delta`` replays it onto the old snapshot and reconstructs the new one
bit-for-bit — the roundtrip is the correctness proof.

Plan shape (the 100 TB story):
- ``compact_delta`` is ONE null-safe full-outer join shuffled on the business
  key — identical cost to the core diff — followed by a null-safe any-column
  inequality filter. Output ∝ churn: at 1% churn the delta is ~1% of the
  snapshot, so shipping/storing it beats rewriting 100 TB by 100×.
- ``apply_delta`` is one left-anti join of the (huge) base against the (small)
  delta keyset — broadcast when churn is small, which it usually is — plus a
  union with the delta's insert/update images. No wide shuffle of the base is
  needed when the delta broadcasts; with both sides bucketed by key the anti
  join is shuffle-free entirely.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = ["compact_delta", "apply_delta", "compose_deltas", "compact_log"]

OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def compact_delta(
    before: DataFrame,
    after: DataFrame,
    keys: list[str],
    value_cols: list[str],
    *,
    include_before: bool = False,
) -> DataFrame:
    """One row per key whose row was inserted, updated, or deleted.

    Both inputs must expose ``keys`` + ``value_cols``. Output columns:
    ``_op`` ('I' | 'U' | 'D'), the key columns, then ``value_cols`` carrying
    the after-image for I/U and the before-image for D. Unchanged keys emit
    nothing — output size is proportional to churn, not table size.

    ``include_before=True`` additionally emits ``_b_<col>`` before-image
    columns (NULL on 'I') — required by consumers that must *retract* old
    contributions, e.g. incremental view maintenance (operators/ivm.py).
    """
    b = before.select(
        F.lit(True).alias("__b"),
        *[F.col(c).alias(f"b_{c}") for c in keys + value_cols],
    )
    a = after.select(
        F.lit(True).alias("__a"),
        *[F.col(c).alias(f"a_{c}") for c in keys + value_cols],
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"b_{k}").eqNullSafe(F.col(f"a_{k}")) for k in keys],
    )
    j = b.join(a, cond, "full_outer")

    in_b, in_a = F.col("__b").isNotNull(), F.col("__a").isNotNull()
    changed = reduce(
        lambda x, y: x | y,
        [~F.col(f"b_{c}").eqNullSafe(F.col(f"a_{c}")) for c in value_cols],
    )
    op = (
        F.when(~in_b, F.lit(OP_INSERT))
        .when(~in_a, F.lit(OP_DELETE))
        .when(changed, F.lit(OP_UPDATE))
    )
    # D rows carry the before-image; I/U rows the after-image
    pick = lambda c: F.when(in_a, F.col(f"a_{c}")).otherwise(F.col(f"b_{c}"))  # noqa: E731
    before_images = (
        [F.col(f"b_{c}").alias(f"_b_{c}") for c in value_cols]
        if include_before
        else []
    )
    return (
        j.select(
            op.alias("_op"),
            *[F.coalesce(F.col(f"b_{k}"), F.col(f"a_{k}")).alias(k) for k in keys],
            *[pick(c).alias(c) for c in value_cols],
            *before_images,
        )
        .filter(F.col("_op").isNotNull())
    )


def apply_delta(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Replay a ``compact_delta`` feed onto ``base``; returns the new snapshot.

    ``base`` rows whose key appears in the delta are dropped (left-anti join —
    broadcastable since the delta ∝ churn), then the delta's insert/update
    images are unioned in. ``apply_delta(before, compact_delta(before, after,
    ...), ...)`` equals ``after`` exactly.
    """
    touched = delta.select(*keys)
    cond = reduce(
        lambda x, y: x & y,
        [base[k].eqNullSafe(touched[k]) for k in keys],
    )
    kept = base.join(touched, cond, "left_anti").select(*keys, *value_cols)
    upserts = delta.filter(
        F.col("_op").isin(OP_INSERT, OP_UPDATE)
    ).select(*keys, *value_cols)
    return kept.unionByName(upserts)


def compose_deltas(
    d1: DataFrame,
    d2: DataFrame,
    keys: list[str],
    value_cols: list[str],
) -> DataFrame:
    """Merge two consecutive changefeeds (before→mid, mid→after) into one
    feed equivalent to before→after under ``apply_delta``.

    Net op per key follows pure existence logic: the key existed *before*
    iff its d1 op isn't 'I' (an inserted key was absent), and exists *after*
    iff its d2 op isn't 'D' — existed+exists = U, existed+gone = D,
    new+exists = I, new+gone = nothing (insert cancelled by delete). Keys in
    only one feed pass through unchanged. Values come from the later feed
    when present.

    The composed feed may carry no-op updates (a key changed in d1 and
    changed back in d2): detecting them would need the original before-image,
    which a changefeed doesn't carry. They are harmless to ``apply_delta``;
    the contract is apply-equivalence, not row-set equality with
    ``compact_delta(before, after)``.

    One null-safe full-outer join shuffled on the key — composing a day of
    hourly feeds is 24 small joins over churn-sized inputs, never touching
    the snapshot. ``apply_delta(s, compose_deltas(d1, d2)) ==
    apply_delta(apply_delta(s, d1), d2)`` (property-tested)."""
    a = d1.select(
        F.col("_op").alias("_op1"),
        *[F.col(k).alias(f"k1_{k}") for k in keys],
        *[F.col(c).alias(f"v1_{c}") for c in value_cols],
    )
    b = d2.select(
        F.col("_op").alias("_op2"),
        *[F.col(k).alias(f"k2_{k}") for k in keys],
        *[F.col(c).alias(f"v2_{c}") for c in value_cols],
    )
    cond = reduce(
        lambda x, y: x & y,
        [F.col(f"k1_{k}").eqNullSafe(F.col(f"k2_{k}")) for k in keys],
    )
    j = a.join(b, cond, "full_outer")

    op1, op2 = F.col("_op1"), F.col("_op2")
    existed_before = op1 != OP_INSERT          # null-safe below via isNull checks
    exists_after = op2 != OP_DELETE
    both_op = (
        F.when(existed_before & exists_after, F.lit(OP_UPDATE))
        .when(existed_before & ~exists_after, F.lit(OP_DELETE))
        .when(~existed_before & exists_after, F.lit(OP_INSERT))
        # ~existed_before & ~exists_after: insert cancelled by delete -> NULL
    )
    net_op = (
        F.when(op2.isNull(), op1)              # key only in d1
        .when(op1.isNull(), op2)               # key only in d2
        .otherwise(both_op)
    )
    in_2 = op2.isNotNull()
    return (
        j.select(
            net_op.alias("_op"),
            *[
                F.coalesce(F.col(f"k1_{k}"), F.col(f"k2_{k}")).alias(k)
                for k in keys
            ],
            *[
                F.when(in_2, F.col(f"v2_{c}"))
                .otherwise(F.col(f"v1_{c}"))
                .alias(c)
                for c in value_cols
            ],
        )
        .filter(F.col("_op").isNotNull())
    )


def compact_log(
    log: DataFrame,
    keys: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Kafka-style log compaction: reduce an append-only changefeed log
    (multiple I/U/D records per key over time) to each key's LATEST record.

    ``order_cols`` define the per-key event order (e.g. a feed sequence
    number, or commit timestamp + offset); the lexicographically greatest
    wins. One window shuffle on the key. The compacted feed applied once
    equals applying the full log in order — the final image and existence
    of a key depend only on its last record ('I'/'U' carry the after-image,
    'D' carries removal), so ``apply_delta(base, compact_log(log, ...))``
    reproduces the sequential replay (property-tested). Keep the 'D'
    records in the compacted feed (tombstones): dropping them would
    resurrect deleted keys on apply over an older base.

    Versus :func:`compose_deltas`: compose merges two *snapshot-consistent*
    feeds with existence algebra and stays churn-proportional; compact
    collapses an arbitrary-length per-key history in one window pass —
    the right tool when the input is a raw CDC stream dump."""
    w = Window.partitionBy(*keys).orderBy(
        *[F.col(c).desc() for c in order_cols]
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
