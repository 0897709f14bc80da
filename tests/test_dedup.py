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


def test_embedding_verify_kernel_matches_expression_path(spark):
    """The r6 ordered-NumPy cosine verify must be bit-identical to the
    JVM dense_cosine_expr path (same fold order, correctly-rounded
    sqrt), and must refuse corpora it cannot reproduce exactly."""
    from entity_resolver_spark.operators import dedup as D

    # clustered vectors -> lots of candidates, incl. pairs near the floor
    import numpy as np

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((3, 16))
    rows = []
    for i in range(120):
        v = centers[i % 3] + rng.standard_normal(16) * 0.05
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    new = D.embedding_dup_pairs(emb, cosine_floor=0.9)
    orig = D._cosine_verify_kernel
    try:
        D._cosine_verify_kernel = lambda *a, **k: None  # force JVM path
        old = D.embedding_dup_pairs(emb, cosine_floor=0.9)
        assert new.schema == old.schema
        assert new.exceptAll(old).count() == 0
        assert old.exceptAll(new).count() == 0
        assert new.count() > 100  # the fixture actually exercises pairs
    finally:
        D._cosine_verify_kernel = orig

    # non-finite vectors must fall back (Spark's NaN >= floor is true,
    # NumPy's is false — the kernel refuses rather than diverge)
    bad = spark.createDataFrame(
        [(0, [float("nan")] * 4), (1, [1.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    assert D._cosine_verify_kernel(
        bad.select(F.lit(0).alias("id_a"), F.lit(1).alias("id_b")),
        bad.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")),
        0.9,
    ) is None


def test_ngram_size_prefilter_keeps_boundary_pairs(spark):
    """The r6 size-ratio prefilter (J >= t implies t*max <= min over
    DISTINCT shingle counts) must keep pairs sitting exactly ON the
    ratio boundary and only drop pairs that provably cannot reach the
    floor. Brute-force jaccard over distinct word-3-grams is the truth."""
    # doc A: 6 words -> 4 shingles; doc B: A's words + 4 more -> 8
    # shingles containing all of A's (n_a/n_b = 0.5, exactly the t=0.5
    # boundary; J = 4/8 = 0.5 >= t must SURVIVE the prefilter)
    a = "alpha beta gamma delta epsilon zeta"
    b = a + " eta theta iota kappa"
    # doc C: shares A's first 4 words (2 shingles of A's 4) but is 3x
    # A's size -> ratio < t, provably below floor, must be dropped
    c = "alpha beta gamma delta " + " ".join(f"w{i}" for i in range(14))
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, jaccard_floor=0.5).collect()
    }

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    sa, sb = sh(a), sh(b)
    want = len(sa & sb) / len(sa | sb)
    assert want == 0.5  # boundary by construction
    assert got == {(1, 2): pytest.approx(want, abs=1e-12)}


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


def test_simhash_pigeonhole_guarantee_vs_bruteforce(spark):
    """Property (VERDICT r1 #6): EVERY pair with hamming <= max_hamming
    must be found — chunk count is derived from the threshold, so the
    pigeonhole guarantee holds at any declared max_hamming."""
    import itertools
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(120):
        base = rng.sample(vocab, 30)
        rows.append((i, " ".join(base)))
        if i % 3 == 0:  # perturbed sibling: swap a few words
            pert = list(base)
            for _ in range(rng.randint(1, 4)):
                pert[rng.randrange(len(pert))] = rng.choice(vocab)
            rows.append((1000 + i, " ".join(pert)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    for mh in (3, 6, 10):
        got = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in simhash_pairs(docs, max_hamming=mh).collect()
        }
        # brute force over all simhashes
        from entity_resolver_spark.operators.dedup import simhash64

        words = F.split(F.lower(F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9 ]", " ")), r"\s+")
        toks = F.filter(words, lambda t: F.length(t) > 0)
        sims = {
            r["doc_id"]: r["sim"]
            for r in docs.select(
                "doc_id",
                simhash64(F.transform(toks, lambda t: F.xxhash64(t))).alias("sim"),
            ).collect()
        }
        expect = {}
        for a, b in itertools.combinations(sorted(sims), 2):
            h = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
            if h <= mh:
                expect[(a, b)] = h
        assert got == expect, f"max_hamming={mh}: missed {set(expect) - set(got)}"


def test_embedding_dedup_recall_at_floor(spark):
    """OR-amplified sketches: recall >= 0.95 for true pairs at cosine
    ~0.95-0.97 on a seeded corpus (VERDICT r1 #10; r1's single table
    had ~0.43)."""
    import numpy as np

    rng = np.random.default_rng(123)
    rows = []
    true_pairs = set()
    for i in range(150):
        v = rng.standard_normal(32)
        v /= np.linalg.norm(v)
        rows.append((i, [float(x) for x in v]))
        # sibling at cosine ~0.96-0.99
        n = rng.standard_normal(32)
        n -= (n @ v) * v
        n /= np.linalg.norm(n)
        theta = rng.uniform(0.1, 0.25)
        w = np.cos(theta) * v + np.sin(theta) * n
        rows.append((1000 + i, [float(x) for x in w]))
        if np.cos(theta) >= 0.955:
            true_pairs.add((i, 1000 + i))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_dup_pairs(emb, cosine_floor=0.95).collect()
    }
    found = sum(1 for p in true_pairs if p in got)
    assert found / len(true_pairs) >= 0.95, f"recall {found}/{len(true_pairs)}"


def test_minhash_banding_derived_from_floor():
    from entity_resolver_spark.operators.dedup import pick_banding

    for n_hashes, floor in ((32, 0.5), (32, 0.7), (24, 0.5), (64, 0.8)):
        b = pick_banding(n_hashes, floor)
        r = n_hashes // b
        recall = 1.0 - (1.0 - floor**r) ** b
        assert recall >= 0.95, (n_hashes, floor, b, recall)


# ---------------------------------------------------------------------------
# portable-hash modes (what makes minhash/simhash DuckDB-oracle-checkable)
# ---------------------------------------------------------------------------

def test_portable_minhash_same_semantics(docs):
    """portable=True swaps only the hash family; the verified output is
    exact-Jaccard pairs either way, so values agree pair-for-pair and
    no cross-family false positives appear."""
    prod = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, jaccard_floor=0.5).collect()
    }
    port = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in minhash_lsh_pairs(docs, jaccard_floor=0.5, portable=True).collect()
    }
    assert (1, 2) in port and (1, 3) in port and (2, 3) in port
    for k in set(prod) & set(port):
        assert prod[k] == pytest.approx(port[k], abs=1e-12)
    assert not any({a, b} & {1, 2, 3} and {a, b} & {4, 5} for a, b in port)


def test_portable_simhash_pigeonhole_vs_bruteforce(spark):
    """The recall-1 pigeonhole guarantee is hash-independent: under the
    portable 60-bit mixed hash, banded output still equals brute force
    over all pairs (the exact property the DuckDB oracle relies on)."""
    import itertools
    import random

    from entity_resolver_spark.operators.dedup import simhash64

    rng = random.Random(11)
    vocab = [f"tok{i}" for i in range(150)]
    rows = [(i, " ".join(rng.sample(vocab, 25))) for i in range(80)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=8, portable=True).collect()
    }

    from entity_resolver_spark.operators.textstats import poly_hash_expr

    words = F.split(F.lower(F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9 ]", " ")), r"\s+")
    toks = F.filter(words, lambda t: F.length(t) > 0)

    def tok_hash(t):
        m = poly_hash_expr(t, base=31) * 1073741827 + poly_hash_expr(t, base=37) * 715827883
        return m.bitwiseXOR(F.shiftright(m, 17)).bitwiseAND(F.lit((1 << 60) - 1))

    sims = {
        r["doc_id"]: r["sim"]
        for r in docs.select(
            "doc_id", simhash64(F.transform(toks, lambda t: tok_hash(t))).alias("sim")
        ).collect()
    }
    expect = {}
    for a, b in itertools.combinations(sorted(sims), 2):
        h = bin((sims[a] ^ sims[b]) & ((1 << 64) - 1)).count("1")
        if h <= 8:
            expect[(a, b)] = h
    assert got == expect


def test_portable_token_hash_duckdb_parity(spark):
    """Pin the cross-engine contract: the 60-bit mixed token hash (and
    the poly31 base hash under it) computes the IDENTICAL value in
    DuckDB SQL — this is what the driver's simhash/minhash oracles
    stand on, so a drift in either engine's arithmetic must fail here
    first."""
    import duckdb

    from entity_resolver_spark.operators.textstats import poly_hash_expr

    toks = ["hello", "world123", "a", "transcripts", "q7x", "0", "longertokenvalue"]
    sdf = spark.createDataFrame([(t,) for t in toks], "t string")
    m = (
        poly_hash_expr(F.col("t"), base=31) * 1073741827
        + poly_hash_expr(F.col("t"), base=37) * 715827883
    )
    h = m.bitwiseXOR(F.shiftright(m, 17)).bitwiseAND(F.lit((1 << 60) - 1))
    got = {
        r["t"]: (r["h"], r["p31"])
        for r in sdf.select(
            "t", h.alias("h"), poly_hash_expr(F.col("t"), base=31).alias("p31")
        ).collect()
    }

    con = duckdb.connect()
    poly = (
        "list_reduce(list_transform(range(1, length(t) + 1), "
        "i -> CAST(ascii(substring(t, i, 1)) AS BIGINT)), "
        "(a, b) -> (a * {base} + b) % 1000000007)"
    )
    for t, (hv, p31v) in got.items():
        row = con.execute(
            f"""SELECT xor(m, m >> 17) & ((CAST(1 AS BIGINT) << 60) - 1), p31
                FROM (SELECT {poly.format(base=31)} * 1073741827
                           + {poly.format(base=37)} * 715827883 AS m,
                           {poly.format(base=31)} AS p31
                      FROM (SELECT ? AS t))""",
            [t],
        ).fetchone()
        assert row[0] == hv, t
        assert row[1] == p31v, t
