"""Multimodal column plumbing: opaque binary media + typed metadata.

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, Arrow batch
shapes, ``mapInPandas`` UDF signatures, partitioning by media type —
is real and tested. The decode step is REAL for codec-free formats
(PCM WAV via stdlib ``wave``; binary PPM; uncompressed 24-bit BMP;
"video" as a concatenated-P6 stream), feeding
``extract_decoded_features`` (duration/RMS/ZCR, dimensions/luma,
frame counts) and ``sample_video_frames`` (every-k frames +
nearest-neighbor thumbnails). Compressed containers (JPEG/MP3/MP4)
still raise ``NotImplementedError`` — those need codec libraries the
container doesn't ship — and ``_fake_features`` remains the
md5-based DuckDB-oracle-exact stand-in the driver gate uses.
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
    """Decode a media payload. REAL for codec-free formats —
    PCM WAV (stdlib ``wave``), binary PPM ``P6``, 24-bit uncompressed
    BMP, and "video" as a concatenated-P6 frame stream — returning
    ``{"kind": "audio", "samples": float64[n], "rate": int}`` or
    ``{"kind": "image", "pixels": uint8[h, w, 3]}`` or
    ``{"kind": "video", "frames": [uint8[h, w, 3], ...]}``.

    Compressed containers (JPEG/MP3/MP4/…) still raise
    ``NotImplementedError`` — they need codec libraries this
    container doesn't ship; swap the hook on a cluster image that
    has them."""
    import numpy as np

    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        import io
        import wave

        with wave.open(io.BytesIO(payload), "rb") as w:
            rate = w.getframerate()
            nch = w.getnchannels()
            width = w.getsampwidth()
            raw = w.readframes(w.getnframes())
        if width == 1:
            # WAV stores 8-bit PCM UNSIGNED with a 0x80 zero point
            samples = (
                np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
                - 128.0
            ) / 127.0
        elif width in (2, 4):
            dt = {2: np.int16, 4: np.int32}[width]
            samples = np.frombuffer(raw, dtype=dt).astype(np.float64)
            samples /= float(np.iinfo(dt).max)
        else:
            raise NotImplementedError(f"{width*8}-bit WAV")
        if nch > 1:
            samples = samples.reshape(-1, nch).mean(axis=1)
        return {"kind": "audio", "samples": samples, "rate": rate}
    if payload[:2] == b"P6":
        return {"kind": "image", "pixels": _decode_ppm(payload)}
    if payload[:2] == b"BM":
        return {"kind": "image", "pixels": _decode_bmp24(payload)}
    if payload[:8] == b"PPMVID\x00\x00":  # concatenated-P6 stream
        frames, off = [], 8
        while off < len(payload):
            px, off = _decode_ppm(payload, off, return_end=True)
            frames.append(px)
        return {"kind": "video", "frames": frames}
    # ---- optional library-backed codecs (round-4 hooks): real
    # decode WHEN the library is importable (cluster images that ship
    # Pillow/soundfile), NotImplementedError otherwise — same
    # degrade-to-'undecodable' behavior downstream either way. Tests
    # for these paths are importorskip-marked like the xgboost one.
    if (
        payload[:3] == b"\xff\xd8\xff"            # JPEG
        or payload[:8] == b"\x89PNG\r\n\x1a\n"    # PNG
        or payload[:6] in (b"GIF87a", b"GIF89a")  # GIF
    ):
        try:
            from PIL import Image  # not in this container
        except ImportError as e:
            raise NotImplementedError(
                "JPEG/PNG/GIF decode needs Pillow (not present);"
                " install it on the cluster image to activate"
            ) from e
        import io

        img = Image.open(io.BytesIO(payload)).convert("RGB")
        return {
            "kind": "image",
            "pixels": np.asarray(img, dtype=np.uint8),
        }
    if payload[:4] in (b"fLaC", b"OggS"):
        try:
            import soundfile  # not in this container
        except ImportError as e:
            raise NotImplementedError(
                "FLAC/OGG decode needs soundfile (not present);"
                " install it on the cluster image to activate"
            ) from e
        import io

        data, rate = soundfile.read(io.BytesIO(payload), dtype="float64")
        if getattr(data, "ndim", 1) > 1:
            data = data.mean(axis=1)
        return {"kind": "audio", "samples": data, "rate": int(rate)}
    raise NotImplementedError(
        "compressed media formats require codec libraries not present"
        " in this environment; uncompressed WAV/PPM/BMP/PPMVID decode"
        " natively (JPEG/PNG/GIF and FLAC/OGG activate when"
        " Pillow/soundfile are importable)"
    )


def _decode_ppm(payload: bytes, off: int = 0, return_end: bool = False):
    """Binary PPM (``P6``): ASCII header (magic, width, height,
    maxval, single whitespace) then raw RGB bytes."""
    import numpy as np

    fields, i = [], off + 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while payload[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    end = i + w * h * 3
    px = np.frombuffer(payload[i:end], dtype=np.uint8).reshape(h, w, 3)
    return (px, end) if return_end else px


def _decode_bmp24(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, bottom-up rows,
    4-byte row padding, BGR order)."""
    import struct

    import numpy as np

    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr = struct.unpack_from("<iiHHI", payload, 18)
    w, h, _planes, bpp, compression = hdr
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP")
    row = (w * 3 + 3) & ~3
    px = np.zeros((abs(h), w, 3), dtype=np.uint8)
    for r in range(abs(h)):
        line = np.frombuffer(
            payload[data_off + r * row : data_off + r * row + w * 3],
            dtype=np.uint8,
        ).reshape(w, 3)
        tgt = abs(h) - 1 - r if h > 0 else r  # bottom-up unless h<0
        px[tgt] = line[:, ::-1]  # BGR → RGB
    return px


def resize_nearest(pixels, out_h: int, out_w: int):
    """Nearest-neighbor resize via numpy index maps (no codec lib)."""
    import numpy as np

    h, w = pixels.shape[:2]
    ri = (np.arange(out_h) * h // out_h).astype(np.int64)
    ci = (np.arange(out_w) * w // out_w).astype(np.int64)
    return pixels[ri][:, ci]


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


DECODED_SCHEMA = (
    "media_id long, kind string, duration_s double, rms double,"
    " zcr double, sample_rate int, width int, height int,"
    " mean_lum double, n_frames int"
)


def extract_decoded_features(media: DataFrame) -> DataFrame:
    """REAL feature extraction over decodable payloads (WAV / PPM /
    BMP / PPMVID via :func:`decode_media`): audio → duration, RMS,
    zero-crossing rate, sample rate; image → dimensions + mean luma;
    video → frame count + first-frame dimensions. Undecodable
    (compressed) payloads yield kind='undecodable' with null features
    instead of failing the batch — at corpus scale a poison payload
    must not kill the job. Same no-shuffle Arrow map shape as
    :func:`extract_features`."""
    import numpy as np

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    d = decode_media(b, "")
                except Exception:
                    # unknown magic AND corrupt/truncated payloads
                    # whose magic matched (wave.Error, reshape
                    # ValueError, struct.error, ...): a poison row
                    # must degrade, not kill the batch job
                    rows.append(
                        (int(mid), "undecodable", None, None, None,
                         None, None, None, None, None)
                    )
                    continue
                if d["kind"] == "audio":
                    s = d["samples"]
                    rms = float(np.sqrt(np.mean(s * s))) if s.size else 0.0
                    zcr = (
                        float(np.mean(np.signbit(s[1:]) != np.signbit(s[:-1])))
                        if s.size > 1
                        else 0.0
                    )
                    rows.append(
                        (int(mid), "audio",
                         float(s.size / d["rate"]), rms, zcr,
                         int(d["rate"]), None, None, None, None)
                    )
                elif d["kind"] == "image":
                    px = d["pixels"]
                    rows.append(
                        (int(mid), "image", None, None, None, None,
                         int(px.shape[1]), int(px.shape[0]),
                         float(px.mean()), 1)
                    )
                elif d["frames"]:  # video with >= 1 frame
                    f0 = d["frames"][0]
                    rows.append(
                        (int(mid), "video", None, None, None, None,
                         int(f0.shape[1]), int(f0.shape[0]),
                         float(np.mean([f.mean() for f in d["frames"]])),
                         len(d["frames"]))
                    )
                else:  # valid container, zero frames
                    rows.append(
                        (int(mid), "video", None, None, None, None,
                         None, None, None, 0)
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "duration_s", "rms", "zcr",
                    "sample_rate", "width", "height", "mean_lum",
                    "n_frames",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def sample_video_frames(
    media: DataFrame,
    every_k: int = 2,
    thumb: tuple | None = (4, 4),
) -> DataFrame:
    """REAL frame sampling over concatenated-P6 video payloads: keep
    every ``every_k``-th frame, optionally nearest-neighbor resized
    to ``thumb`` — one output row per kept frame with its thumbnail
    bytes (raw RGB). Non-video payloads produce no rows."""

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                try:
                    d = decode_media(b, "")
                except Exception:
                    continue  # poison payload: contribute no frames
                if d["kind"] != "video":
                    continue
                for fi, px in enumerate(d["frames"]):
                    if fi % every_k:
                        continue
                    if thumb is not None:
                        px = resize_nearest(px, *thumb)
                    rows.append(
                        (int(mid), fi, int(px.shape[1]),
                         int(px.shape[0]), px.tobytes())
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height",
                         "thumb_rgb"],
            )

    return media.select("media_id", "payload").mapInPandas(
        run,
        schema=(
            "media_id long, frame_idx int, width int, height int,"
            " thumb_rgb binary"
        ),
    )
