"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature steps as Arrow-batched mapInPandas stages (brief:
image/audio/video as binary columns; decode stubs — the image/audio
libraries are not in this container, so the DECODE step is a
deterministic fake behind `fake_decode=True` (default) or a clearly
marked NotImplementedError; the Spark-side plumbing — schema,
partitioning, UDF signature, batch shape — is real and tested).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),       # image|audio|video
        T.StructField("payload", T.BinaryType(), True),      # opaque bytes
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes int, payload_hash long, "
    "features array<float>"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (binary payloads are seeded
    pseudo-random bytes — stand-ins for real encoded frames)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 1024)) if kind != "audio" else None,
                int(rng.integers(16, 1024)) if kind != "audio" else None,
                int(rng.integers(1000, 60000)) if kind != "image" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: a seeded hash
    of the payload drives a reproducible pseudo-embedding."""
    h = np.frombuffer(payload, dtype=np.uint8)
    rng = np.random.default_rng(int(h[:8].view(np.uint64)[0]) if len(h) >= 8 else len(h))
    v = rng.standard_normal(dim).astype(np.float32)
    return v / (np.linalg.norm(v) or 1.0)


def extract_features(
    media: DataFrame, dim: int = 32, fake_decode: bool = True
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Real deployments replace `_fake_features` with an actual decode +
    model forward (the Arrow batch shape and output schema stay the
    same). `fake_decode=False` raises NotImplementedError — decoding
    libraries are deliberately absent here.
    """
    if not fake_decode:
        raise NotImplementedError(
            "real media decode requires image/audio libs not present in "
            "this environment; use fake_decode=True for plumbing tests"
        )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        for pdf in batches:
            feats = [
                _fake_features(p if p is not None else b"", dim).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    # crc32 is process-stable (builtin hash() is siphash-
                    # salted per interpreter -> useless as a fingerprint)
                    "payload_hash": [
                        zlib.crc32(bytes(p)) if p is not None else 0
                        for p in pdf["payload"]
                    ],
                    "features": feats,
                }
            )

    return media.repartition(max(media.rdd.getNumPartitions(), 4)).mapInPandas(
        op, schema=FEATURE_SCHEMA
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (pure SQL — the actual frame grab happens in the decode UDF)."""
    vids = media.where(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_at_ms"),
    )
