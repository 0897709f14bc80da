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


# ---------------------------------------------------------------------------
# round-4: encoder-contract failure modes (dim mismatch, NaN rows, dtype)
# ---------------------------------------------------------------------------

import pytest


def _df(spark, n=6):
    return spark.createDataFrame([(i, f"text {i}") for i in range(n)], ["id", "norm_text"])


def test_embed_dim_mismatch_raises(spark):
    def factory():
        return lambda texts: np.zeros((len(texts), 8), dtype=np.float32)  # wrong dim

    with pytest.raises(Exception, match="expected.*16|dim does not match"):
        embed_texts(_df(spark), dim=16, encoder_fn=factory).collect()


def test_embed_nan_rows_raise_by_default(spark):
    def factory():
        def enc(texts):
            out = np.ones((len(texts), 4), dtype=np.float32)
            out[0, 2] = np.nan  # fp16-overflow-style poison in one row
            return out

        return enc

    with pytest.raises(Exception, match="non-finite"):
        embed_texts(_df(spark), dim=4, encoder_fn=factory).collect()


def test_embed_nan_rows_zeroed_when_opted_in(spark):
    def factory():
        def enc(texts):
            out = np.full((len(texts), 4), 0.25, dtype=np.float16)  # also: fp16 dtype
            if len(texts) > 1:
                out[1, 0] = np.inf
            return out

        return enc

    rows = embed_texts(
        _df(spark).coalesce(1), dim=4, encoder_fn=factory, on_nonfinite="zero"
    ).collect()
    by_id = {r["id"]: r["embedding"] for r in rows}
    assert np.allclose(by_id[1], 0.0)  # poisoned row nulled, not propagated
    assert np.allclose(by_id[0], 0.25)  # fp16 coerced to float32 losslessly here
    assert all(len(v) == 4 for v in by_id.values())


def test_embed_float64_output_coerced(spark):
    def factory():
        return lambda texts: np.full((len(texts), 3), 1.0 / 3.0, dtype=np.float64)

    got = embed_texts(_df(spark, 2), dim=3, encoder_fn=factory).collect()
    assert all(abs(v - 1.0 / 3.0) < 1e-6 for r in got for v in r["embedding"])


def test_embed_on_nonfinite_validated_eagerly(spark):
    with pytest.raises(ValueError, match="on_nonfinite"):
        embed_texts(_df(spark), dim=4, on_nonfinite="bogus")
