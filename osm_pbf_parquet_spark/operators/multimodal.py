"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: the payload is an opaque
``binary`` column (or a reference + range into an object store); metadata
(dims, codec, duration) is a typed struct; decode/feature steps are
Arrow-batched ``mapInPandas`` stages so bytes move executor-side only.

The container ships no image/audio libraries, so the actual decoders are
STUBBED (``NotImplementedError`` or a deterministic fake) — the Spark-side
plumbing (schemas, batch iteration, partitioning, UDF signatures) is real
and tested, and a real decoder drops into ``_decode_payload`` unchanged.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField("byte_len", T.IntegerType(), True),
        T.StructField("sha256", T.StringType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature_norm", T.DoubleType(), True),
    ]
)


def attach_binary(df: DataFrame, text_col: str = "text", key: str = "doc_id") -> DataFrame:
    """Stand-in payload: utf-8 bytes of the text column (deterministic).
    In production this column comes from the upstream store; everything
    downstream treats it as opaque bytes."""
    return df.select(
        F.col(key).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.length(F.encode(F.col(text_col), "utf-8")).alias("byte_len"),
        F.sha2(F.encode(F.col(text_col), "utf-8"), 256).alias("sha256"),
    )


def decode_image(payload: bytes) -> object:
    """Real decoder slot — image libs absent in this container."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; plug Pillow/libvips here"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake decode for plumbing tests: derive (width,
    height, n_frames, feature_norm) from the payload digest."""
    h = hashlib.sha256(payload or b"").digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    n_frames = 1 + h[2] % 8
    norm = int.from_bytes(h[3:7], "big") / 2**32
    return width, height, n_frames, round(norm, 6)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over opaque payloads — the real
    multimodal execution shape: ``mapInPandas`` so each task decodes its
    partition's bytes without JVM round-trips. Decoder is the stub."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["width", "height", "n_frames", "feature_norm"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.select("doc_id", "payload").mapInPandas(_extract, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled frame with a byte
    slice as the frame payload (fake slicing in lieu of a video codec).
    Shows the explode-shape batches a video pipeline produces."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_bytes", T.BinaryType(), True),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = payload or b""
                n_frames = 1 + (hashlib.sha256(payload).digest()[2] % 8)
                step = max(len(payload) // max(n_frames, 1), 1)
                for i in range(0, n_frames, every_n):
                    rows.append((doc_id, i, payload[i * step : (i + 1) * step]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return media.select("doc_id", "payload").mapInPandas(_sample, schema)
