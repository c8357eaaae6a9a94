"""Multimodal column plumbing: binary payloads + mapInPandas stages.

The decode boundary is stubbed (no codecs in the container); these tests pin
that (a) the real-codec path raises loudly, (b) the deterministic fake path
produces exact, locally-recomputable values through the full Arrow batch
pipeline, and (c) row-expanding stages (frame sampling) produce the declared
schema and cardinality.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from checkatron_spark import multimodal as M

DOCS = [
    (1, "hello world"),
    (2, "hello world"),  # exact dup of 1
    (3, ""),
    (4, "a much longer piece of text with many bytes in it"),
]


@pytest.fixture(scope="module")
def media(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    return M.as_media(df, "doc_id", F.encode(F.col("text"), "utf-8"), "text")


def test_media_frame_schema(media):
    assert media.columns == ["media_id", "media_type", "codec", "n_bytes", "payload"]
    assert dict(media.dtypes)["payload"] == "binary"
    rows = {r.media_id: r for r in media.collect()}
    assert rows[1].n_bytes == len("hello world")
    assert rows[3].n_bytes == 0


def test_media_stats_hashes(media):
    got = {r.media_id: r for r in M.media_stats(media).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id].sha256 == hashlib.sha256(text.encode()).hexdigest()
        assert got[doc_id].n_bytes == len(text.encode())


def test_decode_real_path_raises(media):
    with pytest.raises(Exception) as exc_info:
        M.media_decode(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_fake_deterministic(media):
    got = {r.media_id: r for r in M.media_decode(media, fake=True).collect()}
    for doc_id, text in DOCS:
        meta = M.fake_decode_meta(text.encode())
        assert (got[doc_id].width, got[doc_id].height, got[doc_id].channels) == (
            meta["width"], meta["height"], meta["channels"]
        )


def test_frame_sample_cardinality(media):
    rows = M.media_frame_sample(media, max_frames=8).collect()
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r.media_id, []).append(r)
    for doc_id, text in DOCS:
        n = len(text.encode())
        k = 1 + n % 8
        frames = sorted(by_id[doc_id], key=lambda r: r.frame_idx)
        assert [f.frame_idx for f in frames] == list(range(k))
        assert [f.byte_offset for f in frames] == [(i * n) // k for i in range(k)]


def test_features_histogram(media):
    got = {r.media_id: r.features for r in M.media_features(media, dims=8).collect()}
    for doc_id, text in DOCS:
        raw = text.encode()
        hist = [0] * 8
        for b in raw:
            hist[b % 8] += 1
        total = len(raw) or 1
        expect = [h / total for h in hist]
        assert got[doc_id] == pytest.approx(expect)


def test_dedup_by_content_hash(spark, media):
    dups = (
        M.media_stats(media)
        .groupBy("sha256")
        .agg(F.min("media_id").alias("keep_id"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    by_keep = {r.keep_id: r.n for r in dups}
    assert by_keep[1] == 2  # docs 1 and 2 share content
    assert by_keep[3] == 1 and by_keep[4] == 1
