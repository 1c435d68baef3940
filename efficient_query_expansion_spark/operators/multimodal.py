"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, Arrow batch
shapes, ``mapInPandas`` UDF signatures, partitioning by media type —
is real and tested; the actual codec step is STUBBED (the container
has no image/audio libraries): ``decode_media`` raises
``NotImplementedError`` and ``_fake_features`` provides the
deterministic stand-in used by tests and the driver entry.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary,"
    " meta_mime string, meta_n_bytes long"
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes long, checksum long,"
    " width int, height int, n_frames int"
)


def synthesize_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media: payload = utf-8 bytes of the text
    (stands in for image/audio blobs with realistic size spread)."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.concat(F.lit("application/x-fake-"), mt).alias("meta_mime"),
        F.length(F.encode("text", "utf-8")).cast("long").alias(
            "meta_n_bytes"
        ),
    )


def decode_media(payload: bytes, media_type: str):
    """REAL codec hook — intentionally unimplemented in this
    container (no PIL/ffmpeg). Swap in the actual decoder on a
    cluster image that ships the codec libraries."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this"
        " environment; use the _fake_features stand-in for plumbing tests"
    )


def _fake_features(payload: bytes, media_type: str):
    """Deterministic stand-in features derived only from the bytes —
    all md5-based so a DuckDB oracle can recompute them exactly
    (CORRECTNESS gate; crc32 is not portable SQL)."""
    n = len(payload)
    digest = hashlib.md5(payload).hexdigest()
    checksum = int(digest[:8], 16)
    h = int(digest[8:12], 16)
    width = 16 + h % 1920
    height = 16 + (h >> 4) % 1080
    n_frames = 1 if media_type == "image" else 1 + n % 240
    return n, checksum, width, height, n_frames


def extract_features(media: DataFrame, batch_hint: int = 256) -> DataFrame:
    """Arrow ``mapInPandas`` feature extraction over binary payloads.

    This is the exact plumbing a real decoder plugs into: per-batch
    pandas frames with ``bytes`` cells, no shuffle (pure map), output
    schema fixed. Partition by media_type upstream for codec locality.
    """

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, mtype, payload in zip(
                pdf["media_id"], pdf["media_type"], pdf["payload"]
            ):
                b = bytes(payload)
                n, checksum, w, h, fr = _fake_features(b, mtype)
                rows.append((int(mid), mtype, n, checksum, w, h, fr))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "checksum",
                    "width", "height", "n_frames",
                ],
            )

    return media.select("media_id", "media_type", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame sampling plumbing: slice the payload at fixed strides
    (stands in for video frame extraction). Output one row per
    sampled 'frame' with its byte offset."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for fi in range(max_frames):
                    off = fi * every_n_bytes
                    if off >= len(b):
                        break
                    chunk = b[off : off + every_n_bytes]
                    fh = int(hashlib.md5(chunk).hexdigest()[:8], 16)
                    rows.append((int(mid), fi, off, fh))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "offset", "frame_hash"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema="media_id long, frame_idx int, offset int, frame_hash long",
    )
