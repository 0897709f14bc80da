"""Community detection on weighted edge DataFrames (SURVEY G4/G8
analogs) — the density-aware complement to connected components.

G2 components merge everything reachable through ANY above-threshold
edge; a single spurious bridge fuses two dense duplicate families.
The reference breaks such bridges with Louvain modularity
(/root/reference/entity_resolver/clusterer.py:400-413, cugraph) and
reconciles two clusterings with a purity ensemble
(clusterer.py:599-937). Spark has no Louvain, and modularity
optimization is inherently sequential — the distributed stand-in with
the same role (splitting bridged dense groups) is weighted
semi-synchronous label propagation:

  * every node starts as its own label (its id — deterministic);
  * each round, a node adopts the label with the largest incident
    edge-weight sum (ties: weight desc, label asc — total order);
  * nodes update in alternating hash-parity phases (semi-synchronous
    LPA, Cordasco & Gargano 2011), which breaks the oscillation that
    makes fully-synchronous LPA non-convergent on bipartite shapes
    and keeps the result deterministic — no random node ordering;
  * fixed round budget; each round is one groupBy shuffle keyed by
    node + one broadcast-free join. O(E) per round, O(log-ish) rounds
    in practice — the same scale shape as components.

`ensemble_clusters` then reconciles a primary clustering with a
secondary one exactly like the reference's ensemble (clusterer.py:
726-937): purity-map secondary groups onto primary clusters (A6,
operators/report.py), RESCUE primary-noise rows through the mapping,
and MINT new clusters from unmapped secondary groups of sufficient
size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from entity_resolver_spark.operators.report import purity_contingency


def label_propagation(
    edges: DataFrame,
    max_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = "weight",
    parity_expr=None,
) -> DataFrame:
    """edges(src, dst[, weight]) -> (id, community). Deterministic
    semi-synchronous weighted LPA; unweighted if weight_col is None.

    parity_expr(id_col) -> 0/1 column picks each node's update phase;
    default pmod(xxhash64(id), 2). Integer-id graphs can pass
    ``lambda c: F.pmod(c, F.lit(2))`` to make the whole computation
    SQL-portable (the value-level DuckDB oracle uses exactly that).

    Early stop after two consecutive quiet rounds is semantics-free:
    a full quiet parity cycle means every node's best label is its
    current one, so further rounds are no-ops — running exactly
    max_iter rounds yields the identical labeling."""
    spark = edges.sparkSession
    if parity_expr is None:
        parity_expr = lambda c: F.pmod(F.xxhash64(c), F.lit(2))  # noqa: E731
    wexpr = F.col(weight_col) if weight_col else F.lit(1.0)
    # symmetric adjacency, one row per directed neighbor
    adj = (
        edges.select(F.col(src_col).alias("u"), F.col(dst_col).alias("v"), wexpr.alias("w"))
        .union(
            edges.select(F.col(dst_col).alias("u"), F.col(src_col).alias("v"), wexpr.alias("w"))
        )
        .groupBy("u", "v")
        .agg(F.max("w").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = adj.select(F.col("u").alias("id")).distinct().withColumn(
        "community", F.col("id")
    ).localCheckpoint(eager=True)

    quiet = 0
    for it in range(max_iter):
        # neighbor label-weight sums
        nbr = (
            adj.join(labels.withColumnRenamed("id", "v"), "v")
            .groupBy("u", "community")
            .agg(F.sum("w").alias("score"))
        )
        best = (
            nbr.withColumn(
                "__rn",
                F.row_number().over(
                    W.partitionBy("u").orderBy(
                        F.col("score").desc(), F.col("community").asc()
                    )
                ),
            )
            .where(F.col("__rn") == 1)
            .select(F.col("u").alias("id"), F.col("community").alias("new_community"))
        )
        # semi-synchronous: only the active hash-parity side updates
        parity = it % 2
        updated = (
            labels.join(best, "id", "left")
            .withColumn(
                "community",
                F.when(
                    (parity_expr(F.col("id")) == parity)
                    & F.col("new_community").isNotNull(),
                    F.col("new_community"),
                ).otherwise(F.col("community")),
            )
            .select("id", "community")
            .localCheckpoint(eager=True)
        )
        changed = (
            updated.join(labels.withColumnRenamed("community", "old"), "id")
            .where(F.col("community") != F.col("old"))
            .count()
        )
        labels = updated
        quiet = quiet + 1 if changed == 0 else 0
        if quiet >= 2:  # both parities quiesced back-to-back
            break
    return labels


def ensemble_clusters(
    assignments: DataFrame,
    id_col: str = "id",
    primary_col: str = "primary",
    secondary_col: str = "secondary",
    noise: object = None,
    purity_min: float = 0.6,
    min_overlap: int = 2,
    min_new_cluster: int = 4,
) -> DataFrame:
    """assignments(id, primary, secondary) -> (id, cluster).

    Reference G8 semantics (clusterer.py:726-937): (1) purity-map
    secondary groups onto primary clusters; (2) rows whose primary is
    noise but whose secondary group maps validly are RESCUED into the
    mapped primary cluster; (3) unmapped secondary groups with >=
    min_new_cluster noise members MINT new clusters (label
    'new#<secondary>'); (4) everyone else keeps their primary label
    (cast to string for the unioned label space)."""
    mapping = purity_contingency(
        assignments.select(
            F.col(secondary_col).alias("label_a"), F.col(primary_col).alias("label_b")
        ),
        noise=noise,
        purity_min=purity_min,
        min_overlap=min_overlap,
    ).select(
        F.col("label_a").alias(secondary_col),
        F.col("best_match").alias("__mapped_primary"),
    )
    df = assignments.join(F.broadcast(mapping), secondary_col, "left")
    is_noise = (
        F.col(primary_col) == F.lit(noise) if noise is not None else F.lit(False)
    )
    # noise members per unmapped secondary group (mint candidates)
    mint_sizes = (
        df.where(
            is_noise
            & F.col("__mapped_primary").isNull()
            & (F.col(secondary_col) != F.lit(noise) if noise is not None else F.lit(True))
        )
        .groupBy(secondary_col)
        .agg(F.count("*").alias("__n_noise"))
        .where(F.col("__n_noise") >= min_new_cluster)
        .select(secondary_col, F.lit(True).alias("__mint"))
    )
    df = df.join(F.broadcast(mint_sizes), secondary_col, "left")
    return df.select(
        F.col(id_col).alias("id"),
        F.when(~is_noise, F.col(primary_col).cast("string"))
        .when(F.col("__mapped_primary").isNotNull(), F.col("__mapped_primary").cast("string"))
        .when(
            F.col("__mint"),
            F.concat(F.lit("new#"), F.col(secondary_col).cast("string")),
        )
        .otherwise(F.col(primary_col).cast("string"))
        .alias("cluster"),
    )
