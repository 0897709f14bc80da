"""Approximate-nearest-neighbor search over an embedding column
(array<float>) — brute-force cosine top-k baseline plus an
IVF-bucketed scale path (brief: similarity search as a first-class
training-data op).

Scale design: brute force is O(Q*N) — fine for a bounded query set
(broadcast the queries, stream the corpus); the IVF variant assigns
every vector to its nearest of K seeded centroids and only scores
query-vs-corpus within the same (or probed) cells, cutting the scan by
~K/nprobe. Centroids are seeded deterministic samples (no kmeans
iterations needed for bucketing to help; swap in proper kmeans on a
real cluster if recall demands it).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _l2_normalize(vec):
    n = F.sqrt(F.aggregate(F.transform(vec, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    return F.when(n > 0, F.transform(vec, lambda x: x / n)).otherwise(vec)


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k: crossJoin(broadcast(queries)) -> window top-k.
    queries(query_id, embedding) is expected to be small (broadcast)."""
    from entity_resolver_spark.functions.similarity import dense_cosine_expr

    c = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("nn_id") != F.col("query_id"))  # before ranking, so top-k is full
        .withColumn("cosine", dense_cosine_expr(F.col("cv"), F.col("qv")))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nn_id", "cosine", "rk")
    )


def ivf_centroids(corpus: DataFrame, n_cells: int, id_col: str = "vec_id",
                  vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Deterministic centroid sample: the n_cells corpus vectors with the
    smallest xxhash64(id, seed) — a seeded uniform sample, L2-normalized.

    orderBy().limit(n) compiles to TakeOrderedAndProject (per-partition
    top-k merged on the driver) so the sample costs one corpus scan with
    NO global sort; the row_number window that mints cell_id then runs
    over only the n_cells sampled rows (bounded by construction)."""
    sample = (
        corpus.select(
            F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)).alias("__h"),
            F.col(id_col).alias("__id"),
            _l2_normalize(F.col(vec_col)).alias("centroid"),
        )
        .orderBy(F.col("__h").asc(), F.col("__id").asc())
        .limit(n_cells)
    )
    w = W.orderBy(F.col("__h").asc(), F.col("__id").asc())
    return (
        sample.withColumn("__rk", F.row_number().over(w))
        .select((F.col("__rk") - 1).alias("cell_id"), "centroid")
    )


def _assign_cells_udf(centroids: np.ndarray, nprobe: int):
    """Returns a pandas UDF mapping an embedding to its nprobe nearest
    cell ids (Arrow-batched NumPy matmul — the centroid matrix is a
    broadcast-sized closure constant)."""
    import pyspark.sql.types as T

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(v: pd.Series) -> pd.Series:  # pragma: no cover
        mat = np.stack([np.asarray(x, dtype=np.float64) for x in v])
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (mat / norms) @ centroids.T
        top = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series([row.astype("int32").tolist() for row in top])

    return assign


def _sql_cell_assign(
    df: DataFrame, cents: DataFrame, id_alias: str, vec_alias: str, nprobe: int
) -> DataFrame:
    """Nearest-cell assignment as a pure DataFrame plan: broadcast
    crossJoin against the (bounded, n_cells-row) centroid table, exact
    cosine, window top-nprobe. Deterministic ties: cosine desc, cell
    asc — the exact ranking an ANSI-SQL oracle reproduces."""
    from entity_resolver_spark.functions.similarity import dense_cosine_expr

    w = W.partitionBy(id_alias).orderBy(F.col("__csim").desc(), F.col("cell_id").asc())
    return (
        df.crossJoin(F.broadcast(cents))
        .withColumn("__csim", dense_cosine_expr(F.col(vec_alias), F.col("centroid")))
        .withColumn("__crk", F.row_number().over(w))
        .where(F.col("__crk") <= nprobe)
        .select(id_alias, vec_alias, F.col("cell_id").alias("cell"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    seed: int = 42,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: corpus vectors live in their single nearest cell;
    each query probes its nprobe nearest cells; exact cosine + window
    top-k inside the probed cells only.

    centroids(cell_id, centroid) optional: explicit cells. With them,
    assignment runs as a pure broadcast-join + window plan whose
    arithmetic (sequential fold, IEEE doubles) an ANSI-SQL engine
    reproduces bit-for-bit — this is what makes the driver's DuckDB
    oracle probe IDENTICAL cells and value-check the result. Without
    them, centroids are seeded samples and assignment is the
    Arrow-batched NumPy matmul (the scale path: one closure constant,
    no join)."""
    from entity_resolver_spark.functions.similarity import dense_cosine_expr

    if centroids is not None:
        cents = centroids.select("cell_id", "centroid")
        c = _sql_cell_assign(
            corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("cv")),
            cents, "nn_id", "cv", 1,
        )
        q = _sql_cell_assign(
            queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")),
            cents, "query_id", "qv", nprobe,
        )
    else:
        rows = ivf_centroids(corpus, n_cells, id_col, vec_col, seed).collect()
        cmat = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
        assign1 = _assign_cells_udf(cmat, 1)
        assignp = _assign_cells_udf(cmat, nprobe)

        c = corpus.select(F.col(id_col).alias("nn_id"), F.col(vec_col).alias("cv")).withColumn(
            "cell", F.element_at(assign1(F.col("cv")), 1)
        )
        q = queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
        ).withColumn("cell", F.explode(assignp(F.col("qv"))))
    scored = (
        c.join(q, "cell")
        .where(F.col("nn_id") != F.col("query_id"))
        .withColumn("cosine", dense_cosine_expr(F.col("cv"), F.col("qv")))
        # same pair can arrive via several probed cells; max() is a no-op
        # on the value but dedupes deterministically
        .groupBy("query_id", "nn_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("nn_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "nn_id", "cosine", "rk")
    )
