"""diff() over nested/multimodal column types: whole-value equality for
arrays, structs, maps, and binary (SURVEY.md §7.4 item 14 — reference
semantics are plain `=`, extended here to types SQL `=` can't touch)."""

from __future__ import annotations

from pyspark.sql import functions as F

from checkatron_spark import diff

REQUIRES_TESTDATA = True  # auto-skip without driver fixtures (conftest)

SCHEMA = (
    "k int, arr array<int>, st struct<x:int,y:string>, "
    "mp map<string,int>, bin binary"
)


def _rows():
    return [
        (1, [1, 2], (1, "a"), {"p": 1, "q": 2}, bytearray(b"\x00\x01")),
        (2, [3], (2, "b"), {"r": 3}, bytearray(b"\xff")),
        (3, None, None, None, None),
    ]


def test_identical_nested_all_match(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    d = diff(df, df, ["k"])
    assert d.filter(
        "ARR > 0 OR ST > 0 OR MP > 0 OR BIN > 0 OR _row_status IS NOT NULL"
    ).count() == 0


def test_nested_differences_detected(spark):
    before = spark.createDataFrame(_rows(), SCHEMA)
    after_rows = [
        (1, [1, 2, 3], (1, "a"), {"p": 1, "q": 2}, bytearray(b"\x00\x01")),
        (2, [3], (2, "CHANGED"), {"r": 4}, bytearray(b"\xfe")),
        (3, None, None, None, None),
    ]
    after = spark.createDataFrame(after_rows, SCHEMA)
    got = {r.K_K: r for r in diff(before, after, ["k"]).collect()}
    assert got[1].ARR == 1 and got[1].ST == 0 and got[1].MP == 0
    assert got[2].ST == 1 and got[2].MP == 1 and got[2].BIN == 1
    assert got[3].ARR == 0 and got[3].MP == 0  # both NULL -> match


def test_map_key_order_irrelevant(spark):
    """Maps with the same entries in different insertion order must match
    (the canonicalization contract)."""
    b = spark.createDataFrame([(1, {"a": 1, "b": 2})], "k int, mp map<string,int>")
    a = spark.createDataFrame([(1, {"b": 2, "a": 1})], "k int, mp map<string,int>")
    assert diff(b, a, ["k"]).collect()[0].MP == 0


def test_embeddings_table_self_diff(spark):
    """Real fixture: embeddings (array<float>) self-diff with one perturbed
    vector."""
    from checkatron_spark.sources.tables import load_table

    emb = load_table(spark, "embeddings", "/root/testdata/sf0.001")
    perturbed = emb.withColumn(
        "embedding",
        F.when(
            F.col("vec_id") == 7,
            F.transform("embedding", lambda x: x + F.lit(1.0)),
        ).otherwise(F.col("embedding")),
    )
    d = diff(emb, perturbed, ["vec_id"])
    changed = d.filter("EMBEDDING = 1").select("K_VEC_ID").collect()
    assert [r.K_VEC_ID for r in changed] == [7]
