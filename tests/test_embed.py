"""Tests for embed_texts (V4 plumbing with deterministic stub encoder)."""

import numpy as np

from entity_resolver_spark.functions.embed import embed_texts, hash_encoder


def test_hash_encoder_contract():
    enc = hash_encoder(dim=16)
    v = enc(["hello world", "hello world", "other text", ""])
    assert v.shape == (4, 16) and v.dtype == np.float32
    assert np.allclose(v[0], v[1])  # deterministic
    assert not np.allclose(v[0], v[2])
    assert np.allclose(np.linalg.norm(v[:3], axis=1), 1.0, atol=1e-6)
    assert np.allclose(v[3], 0.0)  # empty text -> zero vector (guarded norm)


def test_embed_texts_batching_invariant(spark):
    rows = [(i, f"doc {i} alpha beta {'x' * (i % 5)}") for i in range(40)]
    df = spark.createDataFrame(rows, ["id", "norm_text"])
    a = embed_texts(df, dim=16, batch_size=7)
    b = embed_texts(df.repartition(5), dim=16, batch_size=512)
    va = {r["id"]: r["embedding"] for r in a.collect()}
    vb = {r["id"]: r["embedding"] for r in b.collect()}
    # same vector regardless of partitioning and batch slicing
    assert all(np.allclose(va[i], vb[i]) for i in va)
    assert len(va[0]) == 16
    # original columns survive the mapInPandas schema passthrough
    assert set(a.columns) == {"id", "norm_text", "embedding"}


def test_embed_texts_custom_encoder(spark):
    def factory():
        return lambda texts: np.full((len(texts), 4), 0.5, dtype=np.float32)

    df = spark.createDataFrame([(1, "a")], ["id", "norm_text"])
    got = embed_texts(df, dim=4, encoder_fn=factory).collect()[0]["embedding"]
    assert np.allclose(got, 0.5)
