"""Multimodal (image/audio/video) column plumbing for training-data pipelines.

Media travel as opaque ``binary`` columns with typed metadata structs; all
transforms are Arrow-batched ``mapInPandas`` (no per-row Python UDFs). The
actual media *decode* needs codec libraries (PIL/ffmpeg/torchaudio) that are
not in this environment, so decode is stubbed: :func:`decode_media` raises
``NotImplementedError`` unless a library is importable, while
:func:`extract_features` uses a deterministic byte-level featurizer so the
Spark-side plumbing — schema, partitioning, UDF signature, Arrow batch
shape — is real and fully tested.

At 100 TB the media bytes dominate storage: the layout keeps them in their
own column (parquet stores columns independently, so metadata-only scans
never touch media bytes — column pruning is verified in tests), and
framing/feature extraction are map-only passes with no shuffle.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("media", BinaryType()),  # opaque encoded bytes
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                    StructField("n_bytes", LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16
FRAME_BYTES = 256

_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("features", ArrayType(FloatType())),
        # the featurizer's SQL-expressible core, emitted from the SAME Arrow
        # pass so the driver's DuckDB oracle can hash-check this operator
        # (the float feature vector itself is not SQL; these columns are)
        StructField("n_bytes", LongType()),
        StructField("magic_hex", StringType()),  # first media byte, %02X
        StructField("md5_prefix", StringType()),  # md5(bytes) hex[:8]
    ]
)

_FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_no", IntegerType()),
        StructField("frame", BinaryType()),
    ]
)


def synth_media_from_documents(documents: DataFrame) -> DataFrame:
    """Deterministic fake media table derived from the ``documents`` text
    (test/bench stand-in for a real media column; media bytes = utf-8 text,
    media_type cycles by doc_id)."""
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = F.encode(F.col("text"), "utf-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        mt.alias("media_type"),
        media.alias("media"),
        F.struct(
            F.concat(F.lit("x-synth/"), mt).alias("mime"),
            F.pmod(F.col("doc_id") * 37 + 64, F.lit(1024)).cast("int").alias("width"),
            F.pmod(F.col("doc_id") * 53 + 64, F.lit(768)).cast("int").alias("height"),
            (F.length("text") * 10).cast("int").alias("duration_ms"),
            F.length(media).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def decode_media(media_type: str, data: bytes):
    """Real decode — requires codec libraries not present in this
    environment. Import-gated stub (SURVEY.md: multimodal decode is out of
    the text-engine scope; the Spark plumbing around it is in scope)."""
    if media_type == "image":
        try:
            import PIL.Image  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "image decode requires Pillow (not installed in this environment)"
            )
    raise NotImplementedError(f"decode for media_type={media_type!r} is stubbed")


def _byte_features(data: bytes) -> np.ndarray:
    """Deterministic FEATURE_DIM-dim featurizer over raw bytes: bucketed
    byte-histogram mass + md5-seeded projection. Stands in for a real
    encoder; vectorized per batch."""
    if not data:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    arr = np.frombuffer(data, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=16).astype(np.float64)
    feats = hist / arr.size
    seed = int.from_bytes(hashlib.md5(data[:64]).digest()[:4], "big")
    feats = feats + (seed % 997) / 997.0 / 1000.0
    return feats.astype(np.float32)


def extract_features(media: DataFrame) -> DataFrame:
    """media table → (media_id, media_type, features[FEATURE_DIM], n_bytes,
    magic_hex, md5_prefix). Map-only Arrow pass; no shuffle. The trailing
    three columns are the featurizer's SQL-expressible core (byte length,
    magic-byte tag, content digest prefix) computed in the same pass —
    they put this operator under the driver's independent DuckDB hash
    check; only the import-gated real decode stays un-oracled."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) if b is not None else b"" for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "features": [_byte_features(b) for b in blobs],
                    "n_bytes": [len(b) for b in blobs],
                    "magic_hex": [
                        f"{b[0]:02X}" if b else "" for b in blobs
                    ],
                    "md5_prefix": [
                        hashlib.md5(b).hexdigest()[:8] for b in blobs
                    ],
                }
            )

    return media.mapInPandas(run, _FEATURES_SCHEMA)


def sample_frames(media: DataFrame, frame_bytes: int = FRAME_BYTES, stride: int = 2) -> DataFrame:
    """Frame sampling: cut media bytes into fixed-size frames, keep every
    ``stride``-th (the video-keyframe analog). Map-only; one output row per
    kept frame."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["media"]):
                data = bytes(blob) if blob is not None else b""
                for k, start in enumerate(range(0, len(data), frame_bytes)):
                    if k % stride:
                        continue
                    ids.append(mid)
                    nos.append(k)
                    frames.append(data[start : start + frame_bytes])
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return media.mapInPandas(run, _FRAMES_SCHEMA)
