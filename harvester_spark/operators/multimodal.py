"""Multimodal columns: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a typed
metadata struct; decode / resize / frame-sample / feature-extract run as
Arrow-batched pandas functions over ``mapInPandas`` — the Spark-side plumbing
(schemas, batch iteration, partitioning) is real and tested, while the actual
codec call is STUBBED (no image/audio libraries in this container): the
``decode_media`` stage raises ``NotImplementedError`` unless
``fake_decode=True``, which substitutes a deterministic byte-derived frame.

The synthetic ``media`` table derives deterministically from ``documents``
(payload = UTF-8 bytes of text, kind round-robin), so every pure-byte
operator below has an exact DuckDB oracle.

Scale notes: payloads never pass through the driver; frame sampling and
feature extraction are narrow per-row transforms (no shuffle); the only
shuffles are the final analytics groupBys. At 100 TB the media table is
partitioned by (kind, bucket(doc_id)) and the pandas stages stream Arrow
batches — identical plumbing to this implementation.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from harvester_spark.operators.common import load

KINDS = ("image", "audio", "video")
FRAME_SIZE = 64  # bytes per synthetic "frame"
N_SAMPLED = 4

MEDIA_SCHEMA = (
    "doc_id long, kind string, payload binary, "
    "meta struct<n_bytes:int, n_frames:int, codec:string>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic media table (deterministic, both engines)."""
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    n_bytes = F.length(payload)
    return docs.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(k) for k in KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
        ).alias("kind"),
        payload.alias("payload"),
        F.struct(
            n_bytes.cast("int").alias("n_bytes"),
            F.ceil(n_bytes / FRAME_SIZE).cast("int").alias("n_frames"),
            F.lit("synthetic-v1").alias("codec"),
        ).alias("meta"),
    )


# DuckDB 1.0 has no BLOB md5/substring; the synthetic payload is UTF-8 of
# ASCII text, so varchar slicing/hashing is byte-identical to the Spark
# binary ops (the Spark side stays genuinely binary).
_SQL_MEDIA = f"""
  SELECT doc_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)] AS kind,
         text AS payload,
         CAST(octet_length(encode(text)) AS INT) AS n_bytes,
         CAST(ceil(octet_length(encode(text)) * 1.0 / {FRAME_SIZE}) AS INT) AS n_frames
  FROM documents
"""


def decode_media(media: DataFrame, fake_decode: bool = False) -> DataFrame:
    """The stubbed codec stage: payload → decoded frame bytes.

    Real deployments plug a codec (PIL/ffmpeg) into ``_decode_one``; here it
    raises unless ``fake_decode`` substitutes the deterministic stub. The
    mapInPandas plumbing (binary in/out, batch shape) is the tested part.
    """

    def _decode_one(payload: bytes, kind: str) -> bytes:
        if not fake_decode:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "pass fake_decode=True for the deterministic stub"
            )
        return bytes(payload[:FRAME_SIZE])[::-1]  # pseudo-"decoded" first frame

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": pdf["kind"],
                    "frame0": [
                        _decode_one(bytes(p), k)
                        for p, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )
            yield out

    return media.mapInPandas(run, "doc_id long, kind string, frame0 binary")


# ------------------------------------------------------------------ operators


def mm_metadata(spark, sf_dir):
    """Typed metadata projection + per-kind stats."""
    m = media_table(spark, sf_dir)
    return m.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.col("meta.n_bytes").cast("long")).alias("total_bytes"),
        F.sum(F.col("meta.n_frames").cast("long")).alias("total_frames"),
    )


SQL_MM_METADATA = f"""
WITH media AS ({_SQL_MEDIA})
SELECT kind, count(*) AS n_media,
       CAST(sum(CAST(n_bytes AS BIGINT)) AS BIGINT) AS total_bytes,
       CAST(sum(CAST(n_frames AS BIGINT)) AS BIGINT) AS total_frames
FROM media GROUP BY kind
"""


def mm_frame_sample(spark, sf_dir):
    """Sample the first {N_SAMPLED} frames ({FRAME_SIZE}-byte chunks) per
    payload inside an Arrow-batched pandas stage; emit (doc_id, frame_ix,
    offset, frame_md5). Real byte plumbing, no codec needed."""
    m = media_table(spark, sf_dir)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(min(N_SAMPLED, (len(b) + FRAME_SIZE - 1) // FRAME_SIZE)):
                    chunk = b[i * FRAME_SIZE : (i + 1) * FRAME_SIZE]
                    rows.append(
                        (doc_id, i, i * FRAME_SIZE, hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_ix", "offset", "frame_md5"]
            )

    return m.select("doc_id", "payload").mapInPandas(
        run, "doc_id long, frame_ix int, offset int, frame_md5 string"
    )


SQL_MM_FRAME_SAMPLE = f"""
WITH media AS ({_SQL_MEDIA}),
frames AS (
  SELECT doc_id, CAST(i AS INT) AS frame_ix, CAST(i * {FRAME_SIZE} AS INT) AS "offset",
         md5(substring(payload, CAST(i * {FRAME_SIZE} + 1 AS INT), {FRAME_SIZE})) AS frame_md5
  FROM media, (SELECT unnest(range({N_SAMPLED})) AS i)
  WHERE i < least({N_SAMPLED}, CAST(ceil(n_bytes * 1.0 / {FRAME_SIZE}) AS INT))
)
SELECT doc_id, frame_ix, "offset", frame_md5 FROM frames
"""


def mm_feature_extract(spark, sf_dir):
    """Deterministic fake feature vector (4 doubles from the payload md5) —
    the feature-extraction plumbing with an exact cross-engine oracle."""
    m = media_table(spark, sf_dir)
    h = F.md5(F.col("payload"))
    feats = [
        (F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("double") / F.lit(float(2**32))).alias(f"f{i}")
        for i in range(4)
    ]
    return m.select("doc_id", "kind", *feats)


SQL_MM_FEATURE_EXTRACT = f"""
WITH media AS ({_SQL_MEDIA})
SELECT doc_id, kind,
       CAST(('0x' || substr(md5(payload), 1, 8)) AS BIGINT) / CAST(4294967296 AS DOUBLE) AS f0,
       CAST(('0x' || substr(md5(payload), 9, 8)) AS BIGINT) / CAST(4294967296 AS DOUBLE) AS f1,
       CAST(('0x' || substr(md5(payload), 17, 8)) AS BIGINT) / CAST(4294967296 AS DOUBLE) AS f2,
       CAST(('0x' || substr(md5(payload), 25, 8)) AS BIGINT) / CAST(4294967296 AS DOUBLE) AS f3
FROM media
"""


QUERIES = {
    "mm_metadata": (mm_metadata, SQL_MM_METADATA),
    "mm_frame_sample": (mm_frame_sample, SQL_MM_FRAME_SAMPLE),
    "mm_feature_extract": (mm_feature_extract, SQL_MM_FEATURE_EXTRACT),
}
