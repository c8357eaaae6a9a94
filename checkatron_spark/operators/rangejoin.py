"""Range join (point-in-interval) via interval binning.

Spark plans a raw ``p.ts >= i.start AND p.ts < i.end`` join as a broadcast
nested loop — O(points x intervals), the plan that dies first at scale. The
binned formulation turns it into an equi-join:

1. pick a bin width; every point belongs to exactly ONE bin
   (``floor(epoch/width)``);
2. every interval EXPLODES over all bins it overlaps (an interval spanning
   3 bins emits 3 rows — cheap as long as width is not far below the
   typical interval length);
3. equi-join on the bin key (hash shuffle or broadcast — Catalyst's
   choice), then apply the exact containment predicate to discard
   same-bin-but-outside pairs.

Exact: a point inside an interval shares the interval's copy in the
point's bin, and the residual predicate removes everything else. Cost
scales with overlap density, not |points| x |intervals|. Bin width is the
knob: too small multiplies interval copies, too large packs unrelated rows
into a bin — set it near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_binned", "interval_overlap_join"]


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner range join: every (point, interval) pair with
    ``start <= point_ts < end``. Returns all point columns + all interval
    columns. Declarative all the way — the bin explode is a ``sequence``
    + ``explode``, the join an equi-join, the residual a plain filter."""
    p = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / bin_seconds)
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / bin_seconds),
                # end is exclusive: the end-boundary bin still overlaps
                F.floor(F.unix_timestamp(F.col(end_ts)) / bin_seconds),
            )
        ),
    )
    return (
        p.join(i, "_bin")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("_bin")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_seconds: int = 3600,
) -> DataFrame:
    """Interval×interval overlap join (CLOSED intervals: pairs with
    ``l_start <= r_end AND r_start <= l_end``), binned into an equi-join
    like :func:`range_join_binned` — the raw theta join is a nested loop.

    Both sides explode over the bins they cover. The usual hazard — a pair
    sharing k bins appearing k times — is removed WITHOUT a distinct: each
    overlapping pair is attributed to exactly ONE bin, the bin of
    ``greatest(l_start, r_start)`` (the later start lies inside both
    intervals whenever they overlap, so that bin is covered by both
    explode ranges; every other shared bin is filtered). Degenerate
    [t, t] intervals behave as points. Cost scales with overlap density;
    set ``bin_seconds`` near the median interval length."""
    w = float(bin_seconds)

    def bins(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(s)) / w).cast("bigint"),
                    F.floor(F.unix_timestamp(F.col(e)) / w).cast("bigint"),
                )
            ),
        )

    lb = bins(left, l_start, l_end)
    rb = bins(right, r_start, r_end)
    later_start_bin = F.floor(
        F.unix_timestamp(F.greatest(F.col(l_start), F.col(r_start))) / w
    ).cast("bigint")
    return (
        lb.join(rb, "_bin")
        .filter(
            (F.col(l_start) <= F.col(r_end))
            & (F.col(r_start) <= F.col(l_end))
            & (F.col("_bin") == later_start_bin)
        )
        .drop("_bin")
    )
