"""Data-quality guards around the diff operator (SURVEY.md §7.3).

The reference silently fans out m-by-n when a business key is non-unique
within a side (full_compare.sql.j2:56-65 joins have no uniqueness guard; see
SURVEY.md §2.3). These operators make that failure mode observable BEFORE
paying for the full diff:

- ``duplicate_keys``: the violating key groups with their multiplicities —
  one hash aggregate on the key columns, cheap relative to the diff join.
- ``assert_unique_keys``: raises if any side has duplicate keys; intended
  for pipelines where fanout would silently corrupt downstream counts.

At 100 TB: the aggregate shuffles only the key columns (column pruning keeps
the scan narrow) and short-circuits with AQE; run it on the same partitioning
you'll diff on and the exchange is reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["DuplicateKeyError", "assert_unique_keys", "duplicate_keys"]


class DuplicateKeyError(ValueError):
    """A business key is non-unique within one side of a diff."""


def duplicate_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups that would fan out in a diff: (key columns..., n_rows)
    for every group with more than one row. Null-safe: NULL key values
    group together, matching the diff join's eqNullSafe semantics."""
    return (
        df.groupBy(*[F.col(k) for k in keys])
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") > 1)
    )


def assert_unique_keys(
    df: DataFrame, keys: list[str], side: str = "table", sample: int = 5
) -> None:
    """Raise :class:`DuplicateKeyError` with sample offenders if ``keys`` is
    not unique in ``df``. Costs one aggregation over the key columns."""
    offenders = duplicate_keys(df, keys).take(sample)
    if offenders:
        shown = ", ".join(str(tuple(r)) for r in offenders)
        raise DuplicateKeyError(
            f"{side}: key {keys} is non-unique; sample (key..., n_rows): {shown}"
        )
