"""Z-order clustering key: Morton-interleave correctness against a pure
Python reference, and the locality guarantee the layout exists for — every
high-bit bucket covers a bounded rectangle of the 2-D domain."""

from __future__ import annotations

import pyspark.sql.functions as F

from checkatron_spark.functions.layout import spread16, zorder_key2


def _py_spread(x: int) -> int:
    x &= 0xFFFF
    for sh, m in [
        (8, 0x00FF00FF), (4, 0x0F0F0F0F), (2, 0x33333333), (1, 0x55555555)
    ]:
        x = (x | (x << sh)) & m
    return x


def _py_mort(a: int, b: int) -> int:
    return _py_spread(a) | (_py_spread(b) << 1)


def test_zorder_matches_python_reference(spark):
    pairs = [(0, 0), (3, 1), (1, 3), (65535, 65535), (255, 256), (1234, 4321)]
    df = spark.createDataFrame(pairs, "a int, b int")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select(
            "a", "b", zorder_key2(F.col("a"), F.col("b")).alias("z")
        ).collect()
    }
    for a, b in pairs:
        assert got[(a, b)] == _py_mort(a, b), (a, b)


def test_spread16_even_bits_only(spark):
    df = spark.range(0, 1000).select(
        spread16(F.col("id")).alias("s")
    )
    # spread values occupy only even bit positions: s & 0xAAAAAAAA == 0
    bad = df.filter(F.col("s").bitwiseAND(F.lit(0xAAAAAAAA)) != 0).count()
    assert bad == 0


def test_bucket_rectangles_are_bounded(spark):
    """Grouping by z >> 16 must confine each bucket to a 256x256 rectangle
    — the property that makes both dimensions' footer stats tight."""
    import random

    rnd = random.Random(7)
    rows = [(rnd.randrange(65536), rnd.randrange(65536)) for _ in range(5000)]
    df = spark.createDataFrame(rows, "a int, b int")
    z = zorder_key2(F.col("a"), F.col("b"))
    audit = (
        df.select(F.shiftright(z, 16).alias("bk"), "a", "b")
        .groupBy("bk")
        .agg(
            (F.max("a") - F.min("a")).alias("wa"),
            (F.max("b") - F.min("b")).alias("wb"),
        )
    )
    worst = audit.agg(F.max("wa"), F.max("wb")).collect()[0]
    assert worst[0] <= 255 and worst[1] <= 255, tuple(worst)
