"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs. The
Spark-side machinery — schemas, batch shapes, ``mapInPandas`` iterator
signatures, partition sizing — is real and tested.

Image decoding is a REAL pure-Python header parser (``parse_image_dims``):
PNG / GIF / BMP / JPEG dimensions are read from the container headers with
``struct`` — no PIL/libvips needed, which is exactly what a metadata pass
over 100 TB of media wants anyway (never inflate pixels to learn width).
Pixel-level decode and video frame extraction stay stubbed behind
``fake=True`` (no codec libraries in this environment); the deterministic
fake exercises the full pipeline shape.

Scale notes: media rows are large — the batch iterator yields bounded
batches and the recommended layout partitions by a content-hash bucket so a
single executor never holds more than ``maxRecordsPerBatch`` blobs. Unknown
or truncated blobs decode to NULL dimensions instead of failing the job
(at 10^12 rows there is always a corrupt blob; kill-switches don't scale).
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "MEDIA_SCHEMA",
    "with_media_metadata",
    "parse_image_dims",
    "decode_images",
    "extract_features",
    "resize_images",
    "frame_sample",
]

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("data", BinaryType(), True),
        StructField("mime", StringType(), True),
    ]
)

_DECODED_FIELDS = [
    StructField("media_id", LongType(), False),
    StructField("format", StringType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("sha256", StringType(), True),
]
DECODED_SCHEMA = StructType(_DECODED_FIELDS)


def with_media_metadata(df: DataFrame, data_col: str = "data") -> DataFrame:
    """JVM-side metadata: byte length + sha256 of the blob (no decode)."""
    return df.withColumns(
        {
            "n_bytes": F.octet_length(data_col),
            "sha256": F.sha2(data_col, 256),
        }
    )


def _fake_decode(data: bytes) -> tuple[str, int, int]:
    """Deterministic fake decoder: dimensions derived from content hash."""
    h = hashlib.sha256(data or b"").digest()
    return "fake", 64 + h[0] % 192, 64 + h[1] % 192


def parse_image_dims(data: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) parsed from container headers, pure struct.

    Supports PNG, GIF87a/89a, BMP, and JPEG (SOF0/1/2 and the other SOFn
    frame markers). Unknown formats and truncated headers return
    (None, None, None) — a corrupt blob is a NULL row, not a job failure.
    """
    try:
        if len(data) >= 24 and data[:8] == b"\x89PNG\r\n\x1a\n":
            w, h = struct.unpack(">II", data[16:24])
            return "png", w, h
        if len(data) >= 10 and data[:6] in (b"GIF87a", b"GIF89a"):
            w, h = struct.unpack("<HH", data[6:10])
            return "gif", w, h
        if len(data) >= 26 and data[:2] == b"BM":
            w, h = struct.unpack("<ii", data[18:26])
            return "bmp", abs(w), abs(h)  # height may be negative (top-down)
        if len(data) >= 4 and data[:2] == b"\xff\xd8":
            # scan JPEG segments for a start-of-frame marker
            pos = 2
            while pos + 4 <= len(data):
                if data[pos] != 0xFF:
                    pos += 1
                    continue
                marker = data[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2  # standalone markers, no length
                    continue
                if pos + 4 > len(data):
                    break
                seg_len = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
                is_sof = 0xC0 <= marker <= 0xCF and marker not in (
                    0xC4, 0xC8, 0xCC,
                )
                if is_sof:
                    if pos + 9 > len(data):
                        break
                    h, w = struct.unpack(">HH", data[pos + 5 : pos + 9])
                    return "jpeg", w, h
                if marker == 0xDA:  # start of scan: no SOF seen first
                    break
                pos += 2 + seg_len
    except struct.error:  # pragma: no cover - length guards should prevent
        pass
    return None, None, None


def decode_images(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode image blobs to (media_id, format, width, height, n_bytes,
    sha256) via the pure-header parser.

    ``mapInPandas`` so each Arrow batch is handled as one pandas frame; a
    pixel-level decoder (PIL/libvips) would plug into the same iterator.
    ``fake=True`` keeps the deterministic content-hash decoder for blobs
    with no real container header (pipeline-shape tests).
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode = _fake_decode if fake else parse_image_dims
        for pdf in batches:
            parsed = pdf["data"].map(lambda d: decode(bytes(d or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": parsed.map(lambda t: t[0]),
                    "width": parsed.map(lambda t: t[1]).astype("Int32"),
                    "height": parsed.map(lambda t: t[2]).astype("Int32"),
                    "n_bytes": pdf["data"].map(
                        lambda d: len(bytes(d or b""))
                    ).astype("int64"),
                    "sha256": pdf["data"].map(
                        lambda d: hashlib.sha256(bytes(d or b"")).hexdigest()
                    ),
                }
            )

    return df.select("media_id", "data").mapInPandas(_decode_batch, DECODED_SCHEMA)


FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("format", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("aspect_ratio", DoubleType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("bytes_per_pixel", DoubleType(), True),
        StructField("byte_entropy", DoubleType(), True),
    ]
)


def extract_features(df: DataFrame) -> DataFrame:
    """Container-level feature extraction over media blobs — no pixel
    decode needed, so it is REAL in this environment and the right first
    pass at 100 TB (header dims + compression statistics screen most
    corrupt/outlier media before any expensive codec work).

    Features per blob: header (format, width, height), aspect ratio,
    byte count, bytes-per-pixel (compression density), and the Shannon
    entropy of the byte distribution (numpy bincount per Arrow batch —
    near-8.0 for well-compressed media; low values flag padding/garbage).
    """
    import numpy as np

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k.name: [] for k in FEATURES_SCHEMA.fields}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data or b"")
                fmt, w, h = parse_image_dims(blob)
                n = len(blob)
                if n:
                    counts = np.bincount(
                        np.frombuffer(blob, dtype=np.uint8), minlength=256
                    )
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                else:
                    entropy = None
                rows["media_id"].append(mid)
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["aspect_ratio"].append(
                    round(w / h, 6) if w and h else None
                )
                rows["n_bytes"].append(n)
                rows["bytes_per_pixel"].append(
                    round(n / (w * h), 6) if w and h else None
                )
                rows["byte_entropy"].append(
                    round(entropy, 6) if entropy is not None else None
                )
            out = pd.DataFrame(rows)
            out["width"] = out["width"].astype("Int32")
            out["height"] = out["height"].astype("Int32")
            out["n_bytes"] = out["n_bytes"].astype("int64")
            yield out

    return df.select("media_id", "data").mapInPandas(_features, FEATURES_SCHEMA)


def resize_images(
    df: DataFrame, *, max_side: int = 256, fake: bool = False
) -> DataFrame:
    """Resize blobs to fit ``max_side`` — STUB: pixel resampling needs a
    codec library this environment lacks. The Spark-side contract (schema,
    batch iterator, target-dimension arithmetic) is real and tested;
    ``fake=True`` passes the original bytes through with the correctly
    computed target dimensions, a real backend would plug PIL/libvips into
    the marked line."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("target_width", IntegerType(), True),
            StructField("target_height", IntegerType(), True),
            StructField("data", BinaryType(), True),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil_image = None
        if not fake:
            # plug-in backend: PIL when importable (validated end-to-end by
            # scripts/validate_media_backends.py on hosts that have it);
            # this sandbox ships no codec library, so fake=False here
            # raises rather than pretending.
            try:
                from PIL import Image as pil_image  # type: ignore
            except ImportError:
                raise NotImplementedError(
                    "pixel resampling requires PIL/libvips; use fake=True here"
                ) from None
        for pdf in batches:
            rows = {"media_id": [], "target_width": [], "target_height": [],
                    "data": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data or b"")
                _, w, h = parse_image_dims(blob)
                if w and h and max(w, h) > max_side:
                    scale = max_side / max(w, h)
                    tw, th = max(1, round(w * scale)), max(1, round(h * scale))
                else:
                    tw, th = w, h
                if pil_image is not None and w and h:
                    import io

                    try:
                        img = pil_image.open(io.BytesIO(blob))
                        fmt = img.format
                        buf = io.BytesIO()
                        img.resize((tw, th)).save(buf, format=fmt)
                        blob = buf.getvalue()
                    except Exception:
                        tw = th = None
                        blob = None
                rows["media_id"].append(mid)
                rows["target_width"].append(tw)
                rows["target_height"].append(th)
                rows["data"].append(blob)  # fake path: original bytes
            out = pd.DataFrame(rows)
            out["target_width"] = out["target_width"].astype("Int32")
            out["target_height"] = out["target_height"].astype("Int32")
            yield out

    return df.select("media_id", "data").mapInPandas(_resize, schema)


def frame_sample(
    df: DataFrame, *, every_n: int = 10, fake: bool = False
) -> DataFrame:
    """Sample every-nth video frame as (media_id, frame_idx, frame_sha256).

    Stubbed like decode_images: with ``fake=True``, frames are deterministic
    slices of the blob (the Spark-side fan-out and schema are the real
    contract being tested).
    """
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_idx", IntegerType(), False),
            StructField("frame_sha256", StringType(), True),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pil = None
        if not fake:
            # plug-in backend: PIL ImageSequence handles multi-frame GIFs
            # (the committed fixture's animated case); true video codecs
            # need ffmpeg, which no sandbox host ships — validated by
            # scripts/validate_media_backends.py where available.
            try:
                import PIL.Image
                import PIL.ImageSequence

                pil = PIL
            except ImportError:
                raise NotImplementedError(
                    "real frame sampling requires PIL (gif) / ffmpeg (video); "
                    "use fake=True here"
                ) from None
        for pdf in batches:
            rows = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data or b"")
                if pil is not None:
                    import io

                    try:
                        img = pil.Image.open(io.BytesIO(blob))
                        frames = list(pil.ImageSequence.Iterator(img))
                    except Exception:
                        continue  # undecodable blob -> no frames
                    for idx in range(0, len(frames), every_n):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(idx)
                        rows["frame_sha256"].append(
                            hashlib.sha256(
                                frames[idx].convert("RGB").tobytes()
                            ).hexdigest()
                        )
                    continue
                n_frames = max(1, len(blob) // 1024)
                for idx in range(0, n_frames, every_n):
                    chunk = blob[idx * 1024 : (idx + 1) * 1024]
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(idx)
                    rows["frame_sha256"].append(
                        hashlib.sha256(chunk).hexdigest()
                    )
            out = pd.DataFrame(rows)
            out["frame_idx"] = out["frame_idx"].astype("int32")
            yield out

    return df.select("media_id", "data").mapInPandas(_sample, schema)
