"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as `binary` columns with a metadata struct; the
decode / feature-extract / resize / frame-sample operators run as Arrow-
batched `mapInPandas` stages. The actual media decoding is STUBBED in this
container (no image/audio libs available): `decode_fn=None` uses a
deterministic fake (content-hash-derived features) so the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — is real and
tested; pass a real decode_fn (e.g. PIL/librosa-backed) in production.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ])),
])

FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: features derived from the
    content digest. Replace with a real decode in production (see module doc)."""
    if payload is None:
        payload = b""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype="<u4")
    return (raw.astype("float64") / np.float64(2**32)).astype("float32")


def extract_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], np.ndarray] | None = None,
) -> DataFrame:
    """(media_id, kind, features array<float>) via Arrow-batched mapInPandas.

    decode_fn=None → deterministic fake (container has no media libs).
    A real decoder slots in with no plan change: same schema, same batches.
    """
    fn = decode_fn or _fake_decode
    sub = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [fn(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "features": feats,
            })

    return sub.mapInPandas(
        run, schema="media_id long, kind string, features array<float>"
    )


def frame_sample(
    media: DataFrame, every_ms: int = 1000,
    decode_frame_fn: Callable[[bytes, int], bytes] | None = None,
) -> DataFrame:
    """Video → sampled frame rows (media_id, frame_ts_ms, frame binary).

    Frame timestamps come from the typed metadata (duration_ms); the frame
    decode itself is stubbed unless decode_frame_fn is supplied.
    """
    if decode_frame_fn is not None:
        raise NotImplementedError(
            "real frame decoding requires media libs not present in this container"
        )
    ts = media.filter(F.col("kind") == "video").select(
        "media_id",
        "payload",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fake = [
                hashlib.sha256(
                    (p if p is not None else b"") + int(t).to_bytes(8, "little")
                ).digest()
                for p, t in zip(pdf["payload"], pdf["frame_ts_ms"])
            ]
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "frame_ts_ms": pdf["frame_ts_ms"],
                "frame": fake,
            })

    return ts.mapInPandas(run, schema="media_id long, frame_ts_ms long, frame binary")


def synthetic_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for tests (no external data)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64 + (i % 32), dtype=np.uint8).tobytes()
        rows.append((
            i, kind, bytearray(payload),
            ("application/octet-stream", 64 if kind == "image" else None,
             64 if kind == "image" else None,
             5000 if kind == "video" else None),
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
