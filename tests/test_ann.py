"""ANN: brute-force exactness on constructed vectors; IVF recall on
clustered data (where cells are meaningful)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from entity_resolver_spark.operators.ann import brute_force_topk, ivf_topk


@pytest.fixture(scope="module")
def clustered(spark):
    """3 well-separated gaussian clusters in 16d — IVF-friendly."""
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((3, 16)) * 10
    rows = []
    for i in range(120):
        c = i % 3
        v = centers[c] + rng.standard_normal(16)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_brute_force_exact(spark):
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.where("vec_id = 0").selectExpr("vec_id as query_id", "embedding")
    got = [r["nn_id"] for r in brute_force_topk(emb, q, k=3).orderBy("rk").collect()]
    assert got == [1, 2, 3]  # by decreasing cosine


def test_topk_excludes_self_and_respects_k(clustered):
    q = clustered.where("vec_id < 5").selectExpr("vec_id as query_id", "embedding")
    bf = brute_force_topk(clustered, q, k=7)
    assert bf.where("query_id = nn_id").count() == 0
    per_q = bf.groupBy("query_id").count().collect()
    assert all(r["count"] == 7 for r in per_q)


def test_ivf_recall_on_clustered_data(clustered):
    q = clustered.where("vec_id < 12").selectExpr("vec_id as query_id", "embedding")
    bf = brute_force_topk(clustered, q, k=5)
    iv = ivf_topk(clustered, q, k=5, n_cells=6, nprobe=3)
    inter = bf.select("query_id", "nn_id").intersect(iv.select("query_id", "nn_id")).count()
    recall = inter / bf.count()
    assert recall >= 0.9, f"IVF recall {recall}"


def test_ivf_deterministic(clustered):
    q = clustered.where("vec_id < 4").selectExpr("vec_id as query_id", "embedding")
    a = ivf_topk(clustered, q, k=5, n_cells=6, nprobe=2)
    b = ivf_topk(clustered, q, k=5, n_cells=6, nprobe=2)
    assert a.exceptAll(b).count() == 0


def test_ivf_explicit_centroids_full_probe_equals_brute_force(clustered):
    """With explicit centroids and nprobe = n_cells, every cell is
    probed, so the SQL-assignment IVF path must return EXACTLY the
    brute-force answer — an equality (not recall) check on the
    oracle-able code path."""
    from entity_resolver_spark.operators.ann import brute_force_topk, ivf_topk

    q = clustered.where("vec_id < 10").selectExpr("vec_id as query_id", "embedding")
    cents = clustered.where("vec_id < 8").selectExpr(
        "cast(vec_id as int) as cell_id", "embedding as centroid"
    )
    ivf = ivf_topk(clustered, q, k=5, nprobe=8, centroids=cents)
    bf = brute_force_topk(clustered, q, k=5)
    assert ivf.exceptAll(bf).count() == 0
    assert bf.exceptAll(ivf).count() == 0


def test_ivf_explicit_centroids_deterministic(clustered):
    from entity_resolver_spark.operators.ann import ivf_topk

    q = clustered.where("vec_id < 10").selectExpr("vec_id as query_id", "embedding")
    cents = clustered.where("vec_id < 8").selectExpr(
        "cast(vec_id as int) as cell_id", "embedding as centroid"
    )
    r1 = sorted(map(tuple, ivf_topk(clustered, q, k=5, nprobe=2, centroids=cents).collect()))
    r2 = sorted(map(tuple, ivf_topk(clustered, q, k=5, nprobe=2, centroids=cents).collect()))
    assert r1 == r2
