"""Multimodal column plumbing: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched ``mapInPandas`` stages.

The reference has no multimodal surface (SURVEY.md §2.8-2.9); this module is
part of the large-scale training-data-pipeline mandate. The design rule:

- payloads are **opaque bytes** in a ``binary`` column — Spark shuffles/stores
  them without interpretation; metadata (media_type, codec, n_bytes) travels
  in plain typed columns so filters on it are pushed to the parquet scan
  WITHOUT reading payload bytes (column pruning keeps the scan narrow);
- per-item compute (decode, feature-extract, resize, frame-sample) runs in
  ``mapInPandas`` — Arrow moves payload batches to Python zero-copy-ish,
  pandas vectorizes the loop, output schemas are declared up front;
- partitioning: payload batches are bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``; at 100 TB keep payloads
  out of shuffle keys and repartition by a scalar id before heavy stages.

Real codecs (PIL/ffmpeg/librosa) are NOT in this container; the decode
boundary is isolated in ``decode_payload()`` which raises
``NotImplementedError``, and every pipeline stage takes ``fake=True`` to use
``fake_decode_meta()`` — a deterministic stand-in computed from payload bytes
only, so tests and oracles are exact. Swapping in a real codec touches ONE
function; the Spark plumbing (schema, batch iteration, output shape) is real
and tested either way.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "as_media",
    "decode_payload",
    "fake_decode_meta",
    "media_decode",
    "media_features",
    "media_frame_sample",
    "media_resize",
    "media_stats",
]


def as_media(
    df: DataFrame,
    id_col: str,
    payload_expr: F.Column,
    media_type: str,
    codec: str = "raw",
) -> DataFrame:
    """Wrap any source into the canonical media frame:
    ``(media_id bigint, media_type string, codec string, n_bytes long,
    payload binary)``.

    Metadata columns are ordinary typed columns so predicate pushdown and
    column pruning work on them; ``payload`` stays opaque binary.
    """
    return df.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        F.lit(media_type).alias("media_type"),
        F.lit(codec).alias("codec"),
        F.length(payload_expr).cast("long").alias("n_bytes"),
        payload_expr.cast("binary").alias("payload"),
    )


def decode_payload(payload: bytes, media_type: str) -> Any:
    """REAL-CODEC BOUNDARY — intentionally unimplemented in this container.

    Production: dispatch on ``media_type`` to PIL.Image.open / soundfile /
    PyAV etc. Swap this single function; all mapInPandas plumbing stays.
    """
    raise NotImplementedError(
        f"no codec for media_type={media_type!r} in this environment; "
        "use fake=True for the deterministic stand-in"
    )


def fake_decode_meta(payload: bytes) -> dict:
    """Deterministic decode stand-in computed from payload bytes only:
    pretend-width/height from the byte length, channels fixed at 3.
    Exactly reproducible in ANSI SQL from octet_length, so the full
    mapInPandas pipeline is oracle-checkable."""
    n = len(payload)
    return {
        "width": 16 + n % 240,
        "height": 16 + (n * 7919) % 240,
        "channels": 3,
    }


_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)


def media_stats(media: DataFrame) -> DataFrame:
    """Feature extraction over payload bytes (Arrow-batched mapInPandas):
    byte length + content hash. The hash is the canonical content-address
    used by exact media dedup."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "sha256": pdf["payload"].map(
                        lambda b: hashlib.sha256(bytes(b)).hexdigest()
                    ),
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        extract, schema=_STATS_SCHEMA
    )


_DECODE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
    ]
)


def media_decode(media: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode stage: payload -> (width, height, channels).

    ``fake=False`` routes through :func:`decode_payload` (raises here —
    real codecs are not in the container); ``fake=True`` uses the
    deterministic stand-in. Batch shape, schema, and partitioning are
    identical in both modes."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [
                fake_decode_meta(bytes(b))
                if fake
                else decode_payload(bytes(b), mt)
                for b, mt in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "channels": [m["channels"] for m in metas],
                }
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        decode, schema=_DECODE_SCHEMA
    )


_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def media_features(media: DataFrame, dims: int = 8) -> DataFrame:
    """Feature-vector extraction stand-in: a byte-histogram projection of the
    payload into ``dims`` buckets, L1-normalized. Real pipelines swap the
    body for a model forward pass; the Arrow batch shape (binary in,
    array<double> out) is what matters for the 100 TB plan."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["payload"]:
                raw = bytes(b)
                hist = [0] * dims
                for byte in raw:
                    hist[byte % dims] += 1
                total = len(raw) or 1
                feats.append([h / total for h in hist])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media.select("media_id", "payload").mapInPandas(
        featurize, schema=_FEATURES_SCHEMA
    )


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("byte_offset", LongType()),
    ]
)


_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("out_width", IntegerType()),
        StructField("out_height", IntegerType()),
        StructField("resized", IntegerType()),
    ]
)


def media_resize(media: DataFrame, box: int = 224) -> DataFrame:
    """Resize-to-fit plumbing (Arrow-batched mapInPandas): decode dims (fake
    stand-in), then aspect-preserving fit into a ``box`` x ``box`` square —
    images already inside the box pass through. All math is integer floor
    division, so the whole stage is oracle-exact. A real implementation
    replaces the dim source with the decoded image and emits resized bytes;
    the batch shape, schema, and scaling math stay."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in (
                "media_id", "width", "height", "out_width", "out_height",
                "resized",
            )}
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                meta = fake_decode_meta(bytes(b))
                w, h = meta["width"], meta["height"]
                if w <= box and h <= box:
                    ow, oh, rs = w, h, 0
                else:
                    m = max(w, h)
                    ow, oh, rs = max(1, (w * box) // m), max(1, (h * box) // m), 1
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["resized"].append(rs)
            yield pd.DataFrame(rows)

    return media.select("media_id", "payload").mapInPandas(
        resize, schema=_RESIZE_SCHEMA
    )


def media_frame_sample(media: DataFrame, max_frames: int = 8) -> DataFrame:
    """Frame sampling: one output row per sampled frame (row-expanding
    mapInPandas — the video-pipeline shape). Frame count is the deterministic
    stand-in ``1 + n_bytes % max_frames``; offsets are evenly spaced.
    A real sampler replaces the count/offset math with container parsing."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for mid, b in zip(pdf["media_id"], pdf["payload"]):
                n = len(bytes(b))
                k = 1 + n % max_frames
                for i in range(k):
                    ids.append(mid)
                    idxs.append(i)
                    offs.append((i * n) // k)
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "byte_offset": offs}
            )

    return media.select("media_id", "payload").mapInPandas(
        sample, schema=_FRAME_SCHEMA
    )


# ---------------------------------------------------------------------------
# driver-contract queries (payloads derived from documents.text utf-8 bytes —
# opaque binary to Spark; DuckDB oracles recompute from octet_length/sha256)
# ---------------------------------------------------------------------------

def _docs_media(spark, sf_dir: str) -> DataFrame:
    from checkatron_spark.sources.tables import load_table

    docs = load_table(spark, "documents", sf_dir)
    return as_media(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), "text", codec="utf8"
    )


def q_media_stats(spark, sf_dir: str) -> DataFrame:
    return media_stats(_docs_media(spark, sf_dir))


MEDIA_STATS_SQL = (
    "SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes, "
    "sha256(text) AS sha256 FROM documents"
)


def q_media_decode(spark, sf_dir: str) -> DataFrame:
    return media_decode(_docs_media(spark, sf_dir), fake=True)


MEDIA_DECODE_SQL = """
SELECT doc_id AS media_id,
       CAST(16 + n % 240 AS INTEGER) AS width,
       CAST(16 + (n * 7919) % 240 AS INTEGER) AS height,
       CAST(3 AS INTEGER) AS channels
FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
"""


def q_media_frame_sample(spark, sf_dir: str) -> DataFrame:
    return media_frame_sample(_docs_media(spark, sf_dir), max_frames=8)


MEDIA_FRAME_SAMPLE_SQL = """
WITH sized AS (
    SELECT doc_id, octet_length(encode(text)) AS n,
           1 + octet_length(encode(text)) % 8 AS k
    FROM documents
)
SELECT doc_id AS media_id,
       CAST(i AS INTEGER) AS frame_idx,
       (i * n) // k AS byte_offset
FROM (SELECT doc_id, n, k, unnest(range(k)) AS i FROM sized)
"""


def q_media_dedup(spark, sf_dir: str) -> DataFrame:
    """Exact media dedup by content hash: group payloads on sha256 —
    the binary twin of text dedup_exact."""
    stats = media_stats(_docs_media(spark, sf_dir))
    return stats.groupBy("sha256").agg(
        F.min("media_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_dups"),
    )


MEDIA_DEDUP_SQL = (
    "SELECT sha256(text) AS sha256, MIN(doc_id) AS keep_id, "
    "COUNT(*) AS n_dups FROM documents GROUP BY 1"
)


def q_media_resize(spark, sf_dir: str) -> DataFrame:
    """Fit documents-as-media into a 160px box (160 < 16+239 max fake dim,
    so both branches — passthrough and downscale — are exercised)."""
    return media_resize(_docs_media(spark, sf_dir), box=160)


MEDIA_RESIZE_SQL = """
WITH dims AS (
    SELECT doc_id, CAST(16 + n % 240 AS INTEGER) AS w,
           CAST(16 + (n * 7919) % 240 AS INTEGER) AS h
    FROM (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
)
SELECT doc_id AS media_id, w AS width, h AS height,
       CAST(CASE WHEN w <= 160 AND h <= 160 THEN w
                 ELSE greatest(1, (w * 160) // greatest(w, h)) END
            AS INTEGER) AS out_width,
       CAST(CASE WHEN w <= 160 AND h <= 160 THEN h
                 ELSE greatest(1, (h * 160) // greatest(w, h)) END
            AS INTEGER) AS out_height,
       CAST(CASE WHEN w <= 160 AND h <= 160 THEN 0 ELSE 1 END AS INTEGER)
           AS resized
FROM dims
"""


def q_media_features(spark, sf_dir: str) -> DataFrame:
    """Byte-histogram feature vectors, posexploded to one scalar row per
    (media, dim) — array cells don't survive the driver's value-hash, and
    the exploded form is what a feature store would persist anyway. The
    fixture payloads are single-byte text (verified: octet_length(
    encode(text)) == length(text) for every doc), so DuckDB can recompute
    the identical histogram per-character with ``ord`` — each
    histogram/total division is one IEEE double op in both engines,
    bit-identical."""
    feats = media_features(_docs_media(spark, sf_dir), dims=8)
    from pyspark.sql import functions as F

    return feats.select(
        "media_id", F.posexplode("features").alias("dim", "feature")
    )


MEDIA_FEATURES_SQL = """
SELECT doc_id AS media_id, CAST(t.d AS INTEGER) AS dim,
  CAST(len(list_filter(string_split(text, ''), c -> ord(c) % 8 = t.d))
       AS DOUBLE)
  / CAST(greatest(length(text), 1) AS DOUBLE) AS feature
FROM documents CROSS JOIN range(0, 8) AS t(d)
"""


def q_media_neardup_features(spark, sf_dir: str) -> DataFrame:
    """Near-duplicate media via decoded feature vectors: the byte-histogram
    features (the model-embedding stand-in from media_features) are compared
    with BLOCKED cosine — block key = the document language, the metadata
    blocking a real pipeline would use, so pair work is Σ block² instead of
    n² and the join is equi-keyed on the block (operators/similarity.py per-
    block self-join, nothing collected). Swap the featurizer for a real
    image/audio model and the plan is unchanged — that's the point."""
    from checkatron_spark.operators import similarity as S
    from checkatron_spark.sources.tables import load_table

    feats = media_features(_docs_media(spark, sf_dir), dims=8)
    lang = load_table(spark, "documents", sf_dir).select(
        F.col("doc_id").alias("media_id"), "lang"
    )
    vecs = feats.join(lang, "media_id")
    return S.neardup_embedding_cosine(
        vecs,
        id_col="media_id",
        vec_col="features",
        threshold=0.995,
        block_col="lang",
    )


def _media_hist_sql(tbl: str) -> str:
    """Per-character ord() 8-bucket histogram as a DuckDB list expression
    (single-byte payload fixtures, same recomputation as MEDIA_FEATURES_SQL)."""
    return (
        "list_transform(range(0,8), d -> "
        f"CAST(len(list_filter(string_split({tbl}.text, ''), c -> ord(c) % 8 = d)) AS DOUBLE)"
        f" / CAST(greatest(length({tbl}.text), 1) AS DOUBLE))"
    )


def _media_neardup_sql() -> str:
    # same sequential list_reduce fold as the proven embedding oracles
    # (pipelines._DOT) so the FP accumulation order matches Spark's
    # F.aggregate exactly
    fold = (
        "list_reduce(list_transform(range(1, len({a}) + 1), "
        "i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE), (x, y) -> x + y)"
    )
    # histograms and norms are MATERIALIZED per document before the pair
    # join: the original per-pair formulation recomputed the char-split
    # histogram (and the whole cosine, twice) for every one of the
    # O(sum block^2) pairs — fine at sf0.01, a multi-hour stall at sf0.1.
    # Same expressions, same bits, evaluated once per doc instead.
    dot = fold.format(a="a.hv", b="b.hv")
    return f"""
WITH h AS MATERIALIZED (
  SELECT doc_id, lang, {_media_hist_sql('documents')} AS hv FROM documents
),
hn AS MATERIALIZED (
  SELECT doc_id, lang, hv, sqrt({fold.format(a="hv", b="hv")}) AS nrm FROM h
),
v AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ({dot}) / (a.nrm * b.nrm) AS cos
  FROM hn a JOIN hn b ON a.lang = b.lang AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, round(cos, 6) AS cosine_sim
FROM v WHERE cos >= 0.995
"""


QUERIES = {
    "media_stats": q_media_stats,
    "media_decode_fake": q_media_decode,
    "media_frame_sample": q_media_frame_sample,
    "media_dedup_exact": q_media_dedup,
    "media_resize": q_media_resize,
    "media_features": q_media_features,
    "media_neardup_features": q_media_neardup_features,
}


def oracles() -> dict[str, str]:
    return {
        "media_stats": MEDIA_STATS_SQL,
        "media_decode_fake": MEDIA_DECODE_SQL,
        "media_frame_sample": MEDIA_FRAME_SAMPLE_SQL,
        "media_dedup_exact": MEDIA_DEDUP_SQL,
        "media_resize": MEDIA_RESIZE_SQL,
        "media_features": MEDIA_FEATURES_SQL,
        "media_neardup_features": _media_neardup_sql(),
    }
