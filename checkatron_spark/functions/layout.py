"""Z-order (Morton) clustering keys for multi-dimensional data layout.

The reference recommends date-sliced comparisons for big tables
(/root/reference/README.md:288-291) — one-dimensional pruning. At 100 TB,
scans filtered on TWO dimensions (e.g. customer AND date) want files whose
min/max footer stats are tight in *both*; sorting by either column alone
leaves the other's per-file range spanning the whole domain. Writing sorted
by the interleaved-bit Morton code gives every file a small rectangle of the
(a, b) plane, so both filters prune (the Delta/Iceberg Z-ORDER technique —
public algorithm, bit interleaving).

All pure JVM bit arithmetic inside whole-stage codegen — no UDF, no shuffle.
``zorder_bucket_audit``-style queries prove the locality claim: grouping by
the key's high bits yields buckets whose per-bucket min/max rectangles are
tiny versus the domain, which is exactly the file-footer tightness that
drives skipping.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["spread16", "zorder_key2"]

# (shift, mask) stages spreading 16 data bits over 32 positions:
# classic Morton "part1by1" sequence — each stage doubles the gap.
_STAGES = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def spread16(x: Column) -> Column:
    """Spread the low 16 bits of ``x`` into the even bit positions of a
    32-bit value (Morton part1by1). Input is masked to 16 bits first."""
    x = x.cast("bigint").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _STAGES:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_key2(a: Column, b: Column) -> Column:
    """32-bit Morton key interleaving the low 16 bits of ``a`` (even
    positions) and ``b`` (odd positions). Callers map raw dimensions into
    [0, 65536) first — modulus for identifiers, days-since-epoch or similar
    monotone binning for dates — and ``df.sortWithinPartitions`` /
    ``orderBy`` on the key before writing."""
    return spread16(a).bitwiseOR(F.shiftleft(spread16(b), 1))


def spread16_sql(x: str) -> str:
    """DuckDB-SQL twin of :func:`spread16` (for oracle generation)."""
    e = f"({x} & 65535)"
    for shift, mask in _STAGES:
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return e


def zorder_key2_sql(a: str, b: str) -> str:
    """DuckDB-SQL twin of :func:`zorder_key2`."""
    return f"({spread16_sql(a)} | ({spread16_sql(b)} << 1))"
