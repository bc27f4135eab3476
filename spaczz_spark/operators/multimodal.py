"""Multimodal (image/audio/video) column plumbing.

Treats media as opaque ``binary`` columns with typed metadata structs. The
Spark-side machinery — schemas, batch shapes, ``mapInPandas`` iterator
signatures, partition sizing — is real and tested; the actual codec work is
STUBBED (this container has no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder (content-hash-seeded dimensions) exercises the
full pipeline shape.

Scale notes: media rows are large — the batch iterator yields bounded
batches and the recommended layout partitions by a content-hash bucket so a
single executor never holds more than ``maxRecordsPerBatch`` blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["MEDIA_SCHEMA", "with_media_metadata", "decode_images", "frame_sample"]

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


def _fake_decode(data: bytes) -> tuple[int, int]:
    """Deterministic fake decoder: dimensions derived from content hash."""
    h = hashlib.sha256(data or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192


def decode_images(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode image blobs to (media_id, width, height, n_bytes, sha256).

    ``mapInPandas`` so each Arrow batch is handled as one pandas frame; the
    real decoder (PIL/libvips) plugs into ``_decode_batch`` — in this
    environment only ``fake=True`` works and raises otherwise.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real image decoding requires PIL/libvips; "
                    "run with fake=True in this environment"
                )
            dims = pdf["data"].map(lambda d: _fake_decode(bytes(d or b"")))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "n_bytes": pdf["data"].map(
                        lambda d: len(bytes(d or b""))
                    ).astype("int64"),
                    "sha256": pdf["data"].map(
                        lambda d: hashlib.sha256(bytes(d or b"")).hexdigest()
                    ),
                }
            )

    return df.select("media_id", "data").mapInPandas(_decode_batch, DECODED_SCHEMA)


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
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg; use fake=True here"
                )
            rows = {"media_id": [], "frame_idx": [], "frame_sha256": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                blob = bytes(data or b"")
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
