"""Dedup strategies on constructed fixtures with known answers."""

import pyspark.sql.functions as F
import pytest

from entity_resolver_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)
NEAR = BASE.replace("warm", "cold")          # one word differs
FAR = (
    "completely different content about database query optimization and "
    "distributed shuffle partitioning strategies for large analytics jobs"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(1, BASE), (2, BASE), (3, NEAR), (4, FAR), (5, FAR + " extra")]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(docs):
    kept = exact_dedup(docs)
    assert kept.count() == 4  # 1 and 2 collapse
    assert {r["doc_id"] for r in kept.collect()} == {1, 3, 4, 5}
    g = exact_dup_groups(docs).collect()
    assert len(g) == 1 and g[0]["n_dups"] == 2 and g[0]["survivor_id"] == 1


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_pairs(docs, jaccard_floor=0.5).collect()}
    assert (1, 2) in pairs        # exact dup
    assert (1, 3) in pairs and (2, 3) in pairs  # near dup
    assert not any({a, b} & {1, 2, 3} and {a, b} & {4, 5} for a, b in pairs)


def test_ngram_jaccard_matches_minhash_on_verified_pairs(docs):
    mh = {(r["id_a"], r["id_b"]): r["jaccard"] for r in minhash_lsh_pairs(docs, jaccard_floor=0.4).collect()}
    ng = {(r["id_a"], r["id_b"]): r["jaccard"] for r in ngram_jaccard_pairs(docs, jaccard_floor=0.4).collect()}
    # minhash verifies with exact jaccard, so values must agree where both found
    for k in set(mh) & set(ng):
        assert mh[k] == pytest.approx(ng[k], abs=1e-12)
    # exact-jaccard channel can only find MORE pairs than banded minhash
    assert set(mh) <= set(ng)


def test_simhash_near_dup(docs):
    got = {(r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(docs, max_hamming=10).collect()}
    assert got[(1, 2)] == 0       # identical text -> identical simhash
    assert (1, 3) in got          # one-word edit -> small hamming
    assert (1, 4) not in got and (2, 4) not in got


def test_embedding_dup_pairs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.04, 0.0, 0.0]),   # ~same direction
        (3, [0.0, 1.0, 0.0, 0.0]),      # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in embedding_dup_pairs(emb, cosine_floor=0.95).collect()}
    assert got == {(1, 2)}
