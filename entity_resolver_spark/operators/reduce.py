"""Optional dimensionality reduction (SURVEY V5-V7) — distributed
truncated SVD with spectral damping.

The pipeline's default design needs NO global factorization (fixed-
dimension feature hashing, SURVEY §7.1); this operator exists for
parity with the reference's SVD stack when a caller wants reduced
dense vectors (reference GPUTruncatedSVD components.py:60-741, damping
context_vectorizer.py:671-687, PCA second stage 691-741).

Spark-native: pyspark.mllib's IndexedRowMatrix.computeSVD — the one
deliberate RDD surface in the repo, because distributed linear algebra
lives in mllib. The indexed rows keep (id -> row) alignment through
the factorization, so no order assumptions leak in. For n_features up
to a few hundred the gramian is computed distributively and
eigendecomposed ON THE DRIVER (n_features^2 doubles — bounded,
independent of row count), which is exactly the right split at 100 TB:
rows never collect, only the k x n_features projection broadcasts
back.

Damping (V6): projected column j is U_j * s_j by definition; scaling
by s_j^(-beta) yields s_j^(1-beta) — beta=0 keeps raw SVD projection,
beta=1 gives the whitened (correlation-equalized) geometry the
reference's beta=0.4 interpolates toward.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def svd_project(
    records: DataFrame,
    k: int,
    id_col: str = "id",
    vec_col: str = "vec",
    damping_beta: float = 0.0,
) -> DataFrame:
    """records(id_col: integral, vec_col: array<double>) ->
    (id_col, proj: array<double> of length k), proj = U_i * s^(1-beta).
    """
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    rows = records.select(
        F.col(id_col).cast("long").alias("__id"), F.col(vec_col).alias("__v")
    )
    mat = IndexedRowMatrix(
        rows.rdd.map(lambda r: IndexedRow(r["__id"], Vectors.dense(r["__v"])))
    )
    svd = mat.computeSVD(k, computeU=True)
    s = svd.s.toArray()
    scale = [float(sv) ** (1.0 - damping_beta) if sv > 0 else 0.0 for sv in s]
    # U rows are unit-scaled right-singular coefficients; project with
    # the (damped) singular values column-wise
    spark = records.sparkSession
    out = spark.createDataFrame(
        svd.U.rows.map(
            lambda r: (
                int(r.index),
                [float(x) * sc for x, sc in zip(r.vector.toArray(), scale)],
            )
        ),
        schema=f"{id_col} long, proj array<double>",
    )
    return out
