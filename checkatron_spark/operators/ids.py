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

from checkatron_spark.session import scratch_persist

__all__ = ["assign_dense_ids"]

# Above this many cut points, the flat O(cuts)-comparisons-per-row filter
# is replaced by an O(log cuts) binary search (ADVICE r7): higher-order
# lambdas are interpreted, so at the 10k-bucket scale the docstring
# recommends for 100 TB the flat scan would cost ~10k comparisons per row
# in BOTH jobs, dominating runtime.
_FLAT_SCAN_MAX_CUTS = 64


def _n_cuts_below(v: Column, cuts: list[float]) -> Column:
    """``COUNT(c in cuts WHERE v >= c)`` for a sorted cut list — the
    monotone bucket id. Two spellings, identical results:

    - small lists: flat ``size(filter(...))`` — O(cuts) interpreted
      comparisons per row, cheapest constant factor;
    - large lists: branchless binary search (upper bound) unrolled as a
      ``aggregate(sequence(1, ceil(log2(n+1))), ...)`` fold — O(log cuts)
      interpreted steps per row, ~700x fewer comparisons at 10k buckets.

    NaN routes to the top bucket under both (Spark orders NaN above every
    numeric in ``>=`` and in sorts alike); NULL is handled by the caller.
    """
    n = len(cuts)
    cut_arr = F.array(*[F.lit(float(c)) for c in cuts])
    if n <= _FLAT_SCAN_MAX_CUTS:
        return F.size(F.filter(cut_arr, lambda c: v >= c))
    # invariant: answer in [lo, hi]; each step halves the range. mid is in
    # [lo+1, hi] ⊆ [1, n] while lo < hi, so element_at (1-based) is safe.
    depth = n.bit_length()  # >= ceil(log2(n + 1)) iterations pins lo == hi

    def _step(acc: Column, _: Column) -> Column:
        mid = F.floor((acc["lo"] + acc["hi"] + 1) / 2).cast("int")
        return F.when(acc["lo"] >= acc["hi"], acc).otherwise(
            F.when(
                v >= F.element_at(cut_arr, mid),
                F.struct(mid.alias("lo"), acc["hi"].alias("hi")),
            ).otherwise(
                F.struct(
                    acc["lo"].alias("lo"), (mid - F.lit(1)).alias("hi")
                )
            )
        )

    found = F.aggregate(
        F.sequence(F.lit(1), F.lit(depth)),
        F.struct(F.lit(0).alias("lo"), F.lit(n).alias("hi")),
        _step,
    )
    return found["lo"]


def assign_dense_ids(
    df: DataFrame,
    order_col: str,
    tiebreaks: tuple[str, ...] = (),
    *,
    buckets: int = 64,
    id_name: str = "dense_id",
) -> DataFrame:
    """Add ``id_name``: the exact 1-based global ordinal of each row under
    ``ORDER BY order_col ASC NULLS FIRST, *tiebreaks ASC NULLS FIRST`` —
    equal to the single-partition ``row_number`` spelling, computed with a
    bounded window instead. NULL placement is pinned for tiebreaks too
    (ADVICE r7): an oracle spelling must say ``NULLS FIRST`` explicitly,
    since ANSI/DuckDB plain ``ASC`` defaults to NULLS LAST.

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

    # monotone bucket id: count of cut points <= value (0..len(cuts)).
    # NULLs route to bucket -1, which sorts first, matching ASC NULLS FIRST.
    v = F.col(order_col).cast("double")
    n_below = _n_cuts_below(v, cuts) if cuts else F.lit(0)
    bkt: Column = F.when(v.isNull(), F.lit(-1)).otherwise(n_below)
    # Persist before the count job: the offsets and the final plan MUST see
    # the same bucket per row. Without the pin, a non-deterministic upstream
    # (or a source mutated between the two jobs) can surface a bucket absent
    # from the collected counts — silently dropped by the >256-bucket inner
    # join, or a NULL id from the map lookup — instead of an error (ADVICE
    # r7). Also avoids evaluating the bucketing expression twice.
    bucketed = scratch_persist(df.withColumn("_bkt", bkt))

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
        F.col(t).asc_nulls_first() for t in tiebreaks
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
