"""Dense global ordinal assignment without a single-partition window.

The naive Spark spelling of ``ROW_NUMBER() OVER (ORDER BY k)`` is a window
with no PARTITION BY: Catalyst plans it as a single-partition sort — one
task materializes the whole table, the exact shape a 100 TB job cannot run.
Assigning global ordinals (doc ids for a training corpus, line numbers for
an export, offsets for a packed shard) is still a real need, and the
scalable plan is the one Spark's own RangePartitioner uses internally:

1. **boundary sample** — ``approxQuantile`` on the order column gives
   ``buckets - 1`` cut points (one sampling pass; the driver holds O(buckets)
   values);
2. **bucket counts** — a map-side-combined ``groupBy(bucket).count()``; the
   driver cumulative-sums the (at most ``buckets + 1``) counts into offsets;
3. **within-bucket numbering** — ``row_number`` over a window PARTITIONED BY
   bucket (parallel across buckets, memory bounded by the largest bucket),
   plus the bucket's offset folded in as a map-literal lookup — pure
   codegen, no extra join or shuffle.

Correctness is independent of where the sampled boundaries land: any
monotone bucketing of the order column yields the same ordinal, because the
offsets absorb boundary placement exactly. The sample only balances work.
Ties on the order column always share a bucket (the bucket is a function of
the value), so tiebreak ordering stays inside one window group; NULLs get
their own leading bucket, matching ASC NULLS FIRST.

Reference parity: the reference engine has no ordinal operator (its SQL
generator never emits ROW_NUMBER — full_compare.sql.j2 sorts only for
display); this module is part of the mandated beyond-reference pipeline
surface (corpus doc-id assignment).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["assign_dense_ids"]


def assign_dense_ids(
    df: DataFrame,
    order_col: str,
    tiebreaks: tuple[str, ...] = (),
    *,
    buckets: int = 64,
    id_name: str = "dense_id",
) -> DataFrame:
    """Add ``id_name``: the exact 1-based global ordinal of each row under
    ``ORDER BY order_col ASC NULLS FIRST, *tiebreaks ASC`` — equal to the
    single-partition ``row_number`` spelling, computed with a bounded
    window instead.

    ``order_col`` must be numeric (the boundary sample uses approxQuantile);
    ``(order_col, *tiebreaks)`` must be a total order (unique) for the
    ordinal to be deterministic. ``buckets`` bounds window-group size at
    roughly ``n_rows / buckets``: size it so one bucket fits an executor
    (e.g. 10k buckets at 100 TB), not to the cluster's core count.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    from pyspark.sql.types import NumericType

    field = df.schema[order_col]
    if not isinstance(field.dataType, NumericType):
        raise TypeError(
            f"assign_dense_ids needs a numeric order column for the range "
            f"sample; {order_col} is {field.dataType.simpleString()} — order "
            f"by a numeric surrogate (epoch, length, id) or add one"
        )

    # (1) boundary sample — placement affects balance only, never the result
    cuts: list[float] = []
    if buckets > 1:
        probs = [i / buckets for i in range(1, buckets)]
        qs = df.select(F.col(order_col).cast("double").alias("_q")).stat.approxQuantile(
            "_q", probs, 0.001
        )
        cuts = sorted(set(qs))

    # monotone bucket id: count of cut points <= value (0..len(cuts)), as a
    # single flat higher-order expression — a chained `+` over thousands of
    # comparisons nests an Add tree deep enough to overflow Catalyst's
    # recursive traversal. NULLs route to bucket -1, which sorts first,
    # matching ASC NULLS FIRST.
    v = F.col(order_col).cast("double")
    if cuts:
        cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
        n_below = F.size(F.filter(cut_arr, lambda c: v >= c))
    else:
        n_below = F.lit(0)
    bkt: Column = F.when(v.isNull(), F.lit(-1)).otherwise(n_below)
    bucketed = df.withColumn("_bkt", bkt)

    # (2) per-bucket counts -> offsets (driver holds <= buckets + 1 rows)
    rows = bucketed.groupBy("_bkt").count().collect()
    offsets: dict[int, int] = {}
    running = 0
    for r in sorted(rows, key=lambda r: r["_bkt"]):
        offsets[r["_bkt"]] = running
        running += r["count"]

    # (3) bounded window + offset fold. Small bucket counts inline as a
    # map literal (pure codegen, no join); past ~256 buckets the literal
    # expression itself gets large, so fold via a broadcast join instead —
    # same plan shape the window's _bkt shuffle already pays for.
    order = [F.col(order_col).asc_nulls_first()] + [
        F.col(t).asc() for t in tiebreaks
    ]
    w = Window.partitionBy("_bkt").orderBy(*order)
    rn = F.row_number().over(w)
    if not offsets:  # empty input
        return bucketed.withColumn(id_name, rn.cast("bigint")).drop("_bkt")
    if len(offsets) <= 256:
        pairs: list[Column] = []
        for b, off in offsets.items():
            pairs.extend((F.lit(b), F.lit(off)))
        off_col = F.create_map(*pairs)[F.col("_bkt")]
        return (
            bucketed.withColumn(id_name, (off_col + rn).cast("bigint"))
            .drop("_bkt")
        )
    off_df = F.broadcast(
        df.sparkSession.createDataFrame(
            list(offsets.items()), "_bkt int, _off bigint"
        )
    )
    return (
        bucketed.withColumn("_rn", rn)
        .join(off_df, "_bkt")
        .withColumn(id_name, (F.col("_off") + F.col("_rn")).cast("bigint"))
        .drop("_bkt", "_rn", "_off")
    )
