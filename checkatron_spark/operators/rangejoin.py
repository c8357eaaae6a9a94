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

__all__ = ["range_join_binned"]


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
