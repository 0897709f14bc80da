"""Connected components vs a pure-python union-find oracle
(FIXTURES.md F4: chains, stars, cycle, singletons)."""

import pyspark.sql.functions as F

from entity_resolver_spark.operators.components import attach_labels, connected_components


def _oracle(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress fully, label = min member
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _check(spark, edges):
    nodes = sorted({x for e in edges for x in e})
    want = _oracle(edges, nodes)
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert got == {n: c for n, c in want.items()}, (got, want)


def test_chain(spark):
    _check(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])


def test_long_chain(spark):
    # stresses the O(log n) star rounds
    ids = [f"n{i:03d}" for i in range(40)]
    _check(spark, list(zip(ids, ids[1:])))


def test_two_stars_and_cycle(spark):
    edges = [("h1", f"s{i}") for i in range(8)]
    edges += [("h2", f"t{i}") for i in range(6)]
    edges += [("x", "y"), ("y", "z"), ("z", "x")]  # cycle
    _check(spark, edges)


def test_mixed_graph(spark):
    edges = [
        ("a", "b"), ("b", "c"),          # chain
        ("m", "n"),                        # pair
        ("p", "q"), ("q", "r"), ("r", "p"),  # triangle
        ("u", "v"), ("v", "w"), ("u", "w"), ("w", "a"),  # bridges into chain
    ]
    _check(spark, edges)


def test_self_loops_and_duplicates_ignored(spark):
    _check(spark, [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")])


def test_attach_labels_singletons(spark):
    recs = spark.createDataFrame([("a",), ("b",), ("lonely",)], "conv_id string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    labels = connected_components(edges)
    out = {r["conv_id"]: r["cluster"] for r in attach_labels(recs, labels).collect()}
    assert out == {"a": "a", "b": "a", "lonely": "lonely"}


def test_deterministic_label_is_min_id(spark):
    edges = [("z9", "m5"), ("m5", "b2")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    assert set(got.values()) == {"b2"}


def test_distributed_path_matches_driver_fast_path(spark):
    """r6: small edge sets take an exact driver union-find; the
    distributed star rounds remain the at-scale path and must produce
    IDENTICAL labels. Force both paths on the same graph and compare."""
    import random

    rng = random.Random(5)
    edges = [(f"n{rng.randrange(300)}", f"n{rng.randrange(300)}") for _ in range(400)]
    df = spark.createDataFrame(edges, "src string, dst string")
    fast = {r["node"]: r["component"]
            for r in connected_components(df).collect()}
    dist = {r["node"]: r["component"]
            for r in connected_components(df, driver_solve_max_edges=0).collect()}
    assert fast == dist and len(fast) > 0
