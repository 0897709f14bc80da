"""Semantic embedding plumbing (SURVEY V4) — mapInPandas inference.

The reference encodes with SentenceTransformer('BAAI/bge-base-en-v1.5')
(/root/reference/entity_resolver/context_vectorizer.py:255-309). Per
the BASELINE mandate the resolve pipeline replaces semantic embeddings
with hashed TF-IDF, and this sandbox has no transformer runtime — so,
exactly like the multimodal decode stub (operators/multimodal.py), the
SPARK-SIDE PLUMBING here is real (schema, Arrow batching, partition
shape, batch-size control) while the default encoder is a documented
deterministic stand-in. Swap `encoder_fn` for a real model call on a
cluster with the model available; each executor loads the model once
per partition iterator, not per batch.

Scale shape: mapInPandas streams Arrow batches through the encoder —
no collect, no shuffle; batch size bounds executor memory via
spark.sql.execution.arrow.maxRecordsPerBatch.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def hash_encoder(dim: int = 64, seed: int = 42) -> Callable[[list[str]], np.ndarray]:
    """Deterministic stand-in encoder: token-hash projection, L2 rows.
    Not semantic — a fixed, fast, process-independent function with the
    same (batch of texts) -> (n, dim) float32 contract a real model
    has."""
    import zlib

    def encode(texts: list[str]) -> np.ndarray:
        out = np.zeros((len(texts), dim), dtype=np.float32)
        for i, t in enumerate(texts):
            for tok in (t or "").lower().split():
                h = zlib.crc32(f"{seed}:{tok}".encode())
                out[i, h % dim] += 1.0 if (h >> 16) & 1 else -1.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        return out / norms

    return encode


def embed_texts(
    records: DataFrame,
    text_col: str = "norm_text",
    out_col: str = "embedding",
    dim: int = 64,
    batch_size: int = 512,
    encoder_fn: Callable[[], Callable[[list[str]], np.ndarray]] | None = None,
) -> DataFrame:
    """Append out_col: array<float> of length dim, encoder applied in
    Arrow-batched chunks of batch_size. encoder_fn is a FACTORY invoked
    once per partition iterator (per-executor model load), defaulting
    to the deterministic hash encoder."""
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in records.schema)
    out_schema = f"{fields}, {out_col} array<float>"
    factory = encoder_fn or (lambda: hash_encoder(dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encode = factory()  # one model load per partition
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size].copy()
                vecs = encode(list(chunk[text_col].fillna("")))
                chunk[out_col] = [row.tolist() for row in vecs]
                yield chunk

    return records.mapInPandas(run, schema=out_schema)
