"""Confidence scoring + review flags (SURVEY K10/K11, A12).

Reference: /root/reference/entity_resolver/scorer.py:80-179 — cluster
metrics (count, mean probability, cohesion = 1 - std of similarity),
weighted confidence with clip to [0,1], bucketized categories
[0,.5,.7,.85,1] -> Low/Medium/High/Very High, and review flags with a
csv reason column (concat of reasons, scorer.py:168-179).

Here the pair `score` column plays the role of the reference's cluster
probability: avg edge score within a cluster ~ mean membership
probability, stddev -> cohesion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolver_spark.config import ConfidenceConfig


def cluster_edge_stats(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-cluster edge statistics: n_edges, avg/stddev of edge score.
    `edges` = scored match edges (src, dst, score); `labels` =
    (node, component)."""
    lab = labels.withColumnRenamed("node", "src").withColumnRenamed("component", "cluster")
    e = edges.join(lab, "src")
    return e.groupBy("cluster").agg(
        F.count("*").alias("n_edges"),
        F.avg("score").alias("avg_edge_score"),
        F.coalesce(F.stddev_pop("score"), F.lit(0.0)).alias("std_edge_score"),
    )


def score_confidence(
    records: DataFrame, edge_stats: DataFrame, cfg: ConfidenceConfig,
    cluster_col: str = "cluster",
) -> DataFrame:
    """Attach confidence_score, confidence_category, needs_review,
    review_reason (reference K10/K11 weights re-expressed over edge
    statistics)."""
    sizes = records.groupBy(cluster_col).agg(F.count("*").alias("cluster_size"))
    df = (
        records.join(sizes, cluster_col)
        .join(edge_stats.withColumnRenamed("cluster", cluster_col), cluster_col, "left")
        .fillna({"n_edges": 0, "avg_edge_score": 0.0, "std_edge_score": 0.0})
    )
    # singletons: fully confident in themselves (no merge risk)
    avg_s = F.when(F.col("cluster_size") == 1, F.lit(1.0)).otherwise(F.col("avg_edge_score"))
    cohesion = F.when(F.col("cluster_size") == 1, F.lit(1.0)).otherwise(
        1.0 - F.least(F.col("std_edge_score") * 2.0, F.lit(1.0))
    )
    size_factor = F.least(
        F.log(F.col("cluster_size") + 1.0) / F.log(F.lit(11.0)), F.lit(1.0)
    )
    raw = (
        cfg.w_avg_edge_score * avg_s
        + cfg.w_cohesion * cohesion
        + cfg.w_size_factor * size_factor
    )
    # reference K10: x0.95 penalty for enriched records (scorer.py:98-141)
    if "metadata_was_enriched" in records.columns:
        raw = raw * F.when(F.col("metadata_was_enriched"), F.lit(0.95)).otherwise(
            F.lit(1.0)
        )
    conf = F.least(F.greatest(raw, F.lit(0.0)), F.lit(1.0))
    df = df.withColumn("confidence_score", conf)

    # bucketize (reference cudf.cut, scorer.py:141)
    cat = F.when(F.col("confidence_score") < cfg.buckets[1], cfg.categories[0])
    for i in range(1, len(cfg.categories) - 1):
        cat = cat.when(F.col("confidence_score") < cfg.buckets[i + 1], cfg.categories[i])
    cat = cat.otherwise(cfg.categories[-1])
    df = df.withColumn("confidence_category", cat)

    # review flags (scorer.py:158-179)
    low_conf = F.col("confidence_score") < cfg.review_threshold
    big_cluster_low_cohesion = (F.col("cluster_size") >= 5) & (cohesion < 0.6)
    enriched_low = (
        (F.col("metadata_was_enriched") & (F.col("confidence_score") < 0.8))
        if "metadata_was_enriched" in records.columns
        else F.lit(False)
    )  # reference K11: enriched & conf<0.8 (scorer.py:158-179)
    reasons = F.concat_ws(
        ",",
        F.when(low_conf, F.lit("low_confidence")),
        F.when(big_cluster_low_cohesion, F.lit("low_cohesion_large_cluster")),
        F.when(enriched_low, F.lit("enriched_low_confidence")),
    )
    return df.withColumn(
        "needs_review", low_conf | big_cluster_low_cohesion | enriched_low
    ).withColumn("review_reason", F.when(F.length(reasons) > 0, reasons))
