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
    on_nonfinite: str = "error",
) -> DataFrame:
    """Append out_col: array<float> of length dim, encoder applied in
    Arrow-batched chunks of batch_size. encoder_fn is a FACTORY invoked
    once per partition iterator (per-executor model load), defaulting
    to the deterministic hash encoder.

    Encoder OUTPUT is validated per batch (real models fail in exactly
    these ways — wrong projection head dim, fp16 overflow NaN/Inf):
      * wrong shape (rows, dim mismatch) -> ValueError immediately, a
        config error no amount of data should paper over;
      * dtype is coerced to float32 (models emit float64/float16);
      * non-finite values: on_nonfinite='error' (default) raises with
        the offending row count; 'zero' replaces affected ROWS with the
        zero vector — the same convention the hash encoder uses for
        empty text — so downstream cosine math never sees NaN.
    """
    if on_nonfinite not in ("error", "zero"):
        raise ValueError(f"on_nonfinite must be 'error' or 'zero', got {on_nonfinite!r}")
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in records.schema)
    out_schema = f"{fields}, {out_col} array<float>"
    factory = encoder_fn or (lambda: hash_encoder(dim))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encode = factory()  # one model load per partition
        for pdf in batches:
            for lo in range(0, len(pdf), batch_size):
                chunk = pdf.iloc[lo : lo + batch_size].copy()
                vecs = np.asarray(encode(list(chunk[text_col].fillna(""))))
                if vecs.shape != (len(chunk), dim):
                    raise ValueError(
                        f"encoder returned shape {vecs.shape}, expected "
                        f"({len(chunk)}, {dim}) — encoder dim does not match "
                        f"embed_texts(dim={dim})"
                    )
                vecs = vecs.astype(np.float32, copy=False)
                bad = ~np.isfinite(vecs).all(axis=1)
                if bad.any():
                    if on_nonfinite == "error":
                        raise ValueError(
                            f"encoder produced non-finite values in "
                            f"{int(bad.sum())}/{len(chunk)} rows of a batch "
                            f"(pass on_nonfinite='zero' to null them out)"
                        )
                    vecs[bad] = 0.0
                chunk[out_col] = [row.tolist() for row in vecs]
                yield chunk

    return records.mapInPandas(run, schema=out_schema)
