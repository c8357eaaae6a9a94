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

The explode is the one silent-blowup hazard: an interval spanning k bins
becomes k rows, so a single adversarial row (an open-ended sentinel end
like 9999-12-31, or a year-long interval at 1-hour bins = 8,760 copies)
can OOM-shape the stage with no error. Both operators therefore enforce
``max_bins_per_interval`` (default 1024) INSIDE the explode expression —
codegen-side, zero extra jobs — and raise with the offending bounds
instead of materializing the blowup, the same fail-fast discipline as
``ann_bruteforce_topk``'s row cap. Intervals with a NULL endpoint keep
the pre-existing semantics (dropped by the NULL sequence), they do not
trip the guard.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_binned", "interval_overlap_join"]


def _guarded_bins(
    s: str, e: str, bin_seconds: float, max_bins: int
) -> Column:
    """``sequence(floor(s/w), floor(e/w))`` with the bins-per-row cap
    compiled into the expression: rows over the cap raise (with their
    bounds in the message) before the explode can materialize them.
    NULL-endpoint rows produce a NULL sequence (dropped by explode),
    matching the unguarded behavior."""
    lo = F.floor(F.unix_timestamp(F.col(s)) / bin_seconds).cast("bigint")
    hi = F.floor(F.unix_timestamp(F.col(e)) / bin_seconds).cast("bigint")
    nbins = hi - lo + F.lit(1)
    ok = F.coalesce(nbins <= F.lit(max_bins), F.lit(True))  # NULL -> pass
    return F.when(ok, F.sequence(lo, hi)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "range join: interval spans more bins than "
                    f"max_bins_per_interval ({max_bins}): ["
                ),
                F.col(s).cast("string"),
                F.lit(", "),
                F.col(e).cast("string"),
                F.lit("] at bin_seconds="),
                F.lit(str(int(bin_seconds))),
                F.lit(" = "),
                nbins.cast("string"),
                F.lit(
                    " bin copies. Raise bin_seconds toward the typical "
                    "interval length, cap/clean outlier intervals, or "
                    "raise max_bins_per_interval explicitly."
                ),
            )
        )
    )


def _auto_bin_seconds(
    parts: list[tuple[DataFrame, str, str]], max_bins: int = 1024
) -> int:
    """Derive the bin width from the data (VERDICT r9 #5): the MEDIAN
    interval length across the given (df, start, end) sides, in one cheap
    aggregate job (approx-percentile over the length column; the width is
    a performance knob, never a correctness input — results are exact at
    any width, so approx is fine). Median-length bins mean a typical
    interval explodes to ~2 copies while same-bin packing stays near the
    overlap density.

    The same aggregate also takes the MAX length, and the width is floored
    at ceil(max_len / (max_bins - 2)) (review r10): a skewed distribution
    — median 60 s plus one day-long outlier — would otherwise derive a
    width that trips the ``max_bins_per_interval`` guard at runtime; auto
    mode must never pick a width its own guard rejects. NULL-endpoint and
    negative-length rows are excluded (they produce no bins anyway); an
    interval table with no measurable rows falls back to the 3600 s
    default."""
    import math

    lens = None
    for df, s, e in parts:
        col = (
            F.unix_timestamp(F.col(e)) - F.unix_timestamp(F.col(s))
        ).cast("double")
        part = df.select(col.alias("_len")).filter(
            F.col("_len").isNotNull() & (F.col("_len") >= 0)
        )
        lens = part if lens is None else lens.unionByName(part)
    row = lens.agg(
        F.percentile_approx("_len", 0.5).alias("_m"),
        F.max("_len").alias("_mx"),
    ).collect()[0]
    med, mx = row["_m"], row["_mx"]
    if med is None or mx is None or mx <= 0:
        return 3600
    # floor(e/w) - floor(s/w) + 1 <= len/w + 2, so w >= len/(max_bins - 2)
    # guarantees the longest interval stays under the explode guard
    guard_floor = math.ceil(mx / max(max_bins - 2, 1))
    return max(1, int(med), guard_floor)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_seconds: int | None = 3600,
    max_bins_per_interval: int = 1024,
) -> DataFrame:
    """Inner range join: every (point, interval) pair with
    ``start <= point_ts < end``. Returns all point columns + all interval
    columns. Declarative all the way — the bin explode is a ``sequence``
    + ``explode``, the join an equi-join, the residual a plain filter.
    An interval covering more than ``max_bins_per_interval`` bins raises
    instead of silently exploding (see module docstring).
    ``bin_seconds=None`` derives the width from the median interval
    length in one extra aggregate job (:func:`_auto_bin_seconds`)."""
    if bin_seconds is None:
        bin_seconds = _auto_bin_seconds(
            [(intervals, start_ts, end_ts)], max_bins_per_interval
        )
    p = points.withColumn(
        "_bin", F.floor(F.unix_timestamp(F.col(point_ts)) / bin_seconds)
    )
    i = intervals.withColumn(
        "_bin",
        # end is exclusive, but the end-boundary bin still overlaps
        F.explode(
            _guarded_bins(start_ts, end_ts, bin_seconds, max_bins_per_interval)
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
    bin_seconds: int | None = 3600,
    max_bins_per_interval: int = 1024,
    rsuffix: str | None = None,
) -> DataFrame:
    """Interval×interval overlap join (CLOSED intervals: pairs with
    ``l_start <= r_end AND r_start <= l_end``), binned into an equi-join
    like :func:`range_join_binned` — the raw theta join is a nested loop.

    Both sides explode over the bins they cover, each capped at
    ``max_bins_per_interval`` copies (over-cap rows raise with their
    bounds; see module docstring). The usual hazard — a pair sharing k
    bins appearing k times — is removed WITHOUT a distinct: each
    overlapping pair is attributed to exactly ONE bin, the bin of
    ``greatest(l_start, r_start)`` (the later start lies inside both
    intervals whenever they overlap, so that bin is covered by both
    explode ranges; every other shared bin is filtered). Degenerate
    [t, t] intervals behave as points. Cost scales with overlap density;
    set ``bin_seconds`` near the median interval length — or pass
    ``bin_seconds=None`` and the operator derives exactly that (the
    median length across BOTH sides, one extra aggregate job,
    :func:`_auto_bin_seconds`).

    The output carries ALL columns from both sides, so the inputs must
    not share a column name (ADVICE r8: a shared id column would come
    back twice, ambiguous to every name-based select downstream). Shared
    names raise unless ``rsuffix`` is given, in which case the RIGHT
    side's clashing columns are renamed ``<name><rsuffix>`` (including
    ``r_start``/``r_end`` if they clash)."""
    common = [c for c in right.columns if c in set(left.columns)]
    if common:
        if rsuffix is None:
            raise ValueError(
                "interval_overlap_join: left and right share column "
                f"names {common}; the result would carry ambiguous "
                "duplicates. Rename one side, or pass rsuffix= to "
                "suffix the right side's clashing columns."
            )
        taken = set(left.columns) | set(right.columns)
        for c in common:
            renamed = c + rsuffix
            if renamed in taken:
                # the rename itself would manufacture a NEW duplicate
                # (review r9: left {iid, iid_r} + right {iid} with
                # rsuffix='_r') — refuse up front, same contract
                raise ValueError(
                    f"interval_overlap_join: renaming right column {c!r} "
                    f"with rsuffix {rsuffix!r} collides with existing "
                    f"column {renamed!r}; pick a different rsuffix."
                )
            taken.add(renamed)
            right = right.withColumnRenamed(c, renamed)
        if r_start in common:
            r_start = r_start + rsuffix
        if r_end in common:
            r_end = r_end + rsuffix
    if bin_seconds is None:
        bin_seconds = _auto_bin_seconds(
            [(left, l_start, l_end), (right, r_start, r_end)],
            max_bins_per_interval,
        )
    w = float(bin_seconds)

    def bins(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bin",
            F.explode(_guarded_bins(s, e, w, max_bins_per_interval)),
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
