"""Unit tests for mutual_rank_edges (G3/K12) and purity_contingency (A6)."""

import pyspark.sql.functions as F

from entity_resolver_spark.operators.pairs import mutual_rank_edges
from entity_resolver_spark.operators.report import purity_contingency


def test_mutual_rank_weight_formula(spark):
    # a<->b mutual at rank 0 both ways; c ranks a first but a ranks c
    # second; d is one-directional only (never mutual)
    rows = [
        ("a", "b", 0.9),
        ("a", "c", 0.8),
        ("b", "a", 0.9),
        ("c", "a", 0.8),
        ("d", "a", 0.7),  # a never keeps d (k=2 below keeps b, c)
    ]
    df = spark.createDataFrame(rows, ["src", "dst", "sim"])
    out = {
        (r["src"], r["dst"]): r["weight"]
        for r in mutual_rank_edges(df, k=2).collect()
    }
    # a-b: ranks 0+0 -> 1/2 * 0.9 = 0.45
    assert abs(out[("a", "b")] - 0.45) < 1e-12
    # a-c: a ranks c 1, c ranks a 0 -> 1/3 * 0.8
    assert abs(out[("a", "c")] - 0.8 / 3.0) < 1e-12
    assert ("a", "d") not in out and ("d", "a") not in out
    assert len(out) == 2


def test_mutual_rank_k_cutoff_and_floor(spark):
    # b is a's rank-2 neighbor; with k=2 the a->b edge survives, with
    # k=1 it does not (a keeps only c)
    rows = [
        ("a", "c", 0.9),
        ("a", "b", 0.8),
        ("b", "a", 0.9),
        ("c", "a", 0.9),
    ]
    df = spark.createDataFrame(rows, ["src", "dst", "sim"])
    assert mutual_rank_edges(df, k=2).count() == 2
    got = mutual_rank_edges(df, k=1).collect()
    assert [(r["src"], r["dst"]) for r in got] == [("a", "c")]
    # min_edge_weight prunes: a-b weight = 1/(1+0+2) * 0.85 ~ 0.283
    assert mutual_rank_edges(df, k=2, min_edge_weight=0.3).count() == 1


def test_purity_contingency_reference_semantics(spark):
    # a-cluster 1: members b=10 x3, b=20 x1, b=noise x1 -> total 5
    # (noise-b INCLUDED in denominator), best=10, overlap 3, purity 0.6
    # a-cluster 2: all noise-b -> no overlap row at all
    # a=noise rows: excluded entirely
    rows = (
        [(1, 10)] * 3 + [(1, 20), (1, -1)] + [(2, -1)] * 2 + [(-1, 10)] * 4
    )
    df = spark.createDataFrame(rows, ["label_a", "label_b"])
    got = purity_contingency(df, noise=-1).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["label_a"], r["best_match"], r["overlap"], r["total"]) == (1, 10, 3, 5)
    assert abs(r["purity"] - 0.6) < 1e-12


def test_purity_thresholds_and_tiebreak(spark):
    # a=1: b=5 x2 and b=3 x2 tie on overlap -> deterministic best = 3
    rows = [(1, 5), (1, 5), (1, 3), (1, 3)]
    df = spark.createDataFrame(rows, ["label_a", "label_b"])
    r = purity_contingency(df).collect()[0]
    assert r["best_match"] == 3 and r["purity"] == 0.5
    # purity_min filters it out
    assert purity_contingency(df, purity_min=0.6).count() == 0
    # min_overlap filters it out
    assert purity_contingency(df, min_overlap=3).count() == 0


def test_balance_fuse_energy_proportions(spark):
    import numpy as np

    from entity_resolver_spark.operators.vectorize import balance_fuse_expr

    df = spark.createDataFrame(
        [(1, [3.0, 4.0], [10.0, 0.0, 0.0]), (2, [1.0, 0.0], [2.0, 2.0, 1.0])],
        ["id", "a", "b"],
    )
    out = df.select(
        "id", balance_fuse_expr([(F.col("a"), 0.7), (F.col("b"), 0.3)]).alias("f")
    ).collect()
    for r in out:
        v = np.array(r["f"])
        assert len(v) == 5
        assert abs(np.linalg.norm(v) - 1.0) < 1e-12  # final L2
        # energy split matches the configured proportions exactly
        assert abs((v[:2] ** 2).sum() - 0.7) < 1e-12
        assert abs((v[2:] ** 2).sum() - 0.3) < 1e-12
