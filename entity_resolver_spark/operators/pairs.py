"""Block-local pairwise scoring (SURVEY §2.8, stage 4 of the plan).

Reference: similarity kernels in /root/reference/entity_resolver/utils/
similarity.py and the weighted combination in validator.py:396-401 (K8).

Execution shape: the candidate-pair table is joined twice against a
pruned attribute view (reference J3 pattern, address_processor.py:
686-707) — Catalyst prunes columns so only what the kernels need moves
through the shuffle. A cheap JVM-only token-overlap prefilter runs
BEFORE any Python UDF so the Arrow batches only carry plausible pairs
(reference analog: centroid prefilter O5, utils/clustering.py:331-403).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from entity_resolver_spark.config import ScoringConfig
from entity_resolver_spark.functions.similarity import (
    jw_expr,
    lev_sim_expr,
    sparse_cosine_udf,
    token_overlap_cosine_expr,
)

# pairs below this cheap-cosine floor never reach the Python kernels
PREFILTER_FLOOR = 0.15


def score_pairs(
    records: DataFrame, pairs: DataFrame, cfg: ScoringConfig
) -> DataFrame:
    """pairs(conv_a, conv_b) -> scored pairs with individual kernel
    columns and the weighted `score` (all in [0,1]).

    Two-phase join for shuffle volume: phase 1 attaches only the LIGHT
    attributes (length-capped text + unigram token set), runs the JVM
    prefilter and the string kernels; phase 2 attaches the heavy hashed
    TF-IDF arrays ONLY for surviving pairs. At 100TB the candidate set
    is orders of magnitude larger than the survivor set, so the heavy
    arrays never ride the big shuffle."""
    cap = max(cfg.lev_prefix_chars, cfg.jw_prefix_chars)
    light = records.select(
        "conv_id",
        F.substring("norm_text", 1, cap).alias("txt"),
        "tokens",
    )
    la = light.select(
        F.col("conv_id").alias("conv_a"), F.col("txt").alias("txt_a"), F.col("tokens").alias("tokens_a")
    )
    lb = light.select(
        F.col("conv_id").alias("conv_b"), F.col("txt").alias("txt_b"), F.col("tokens").alias("tokens_b")
    )

    # candidate pairs are few bytes each, so AQE coalesces them into a
    # handful of partitions — which would serialize the Arrow UDF work.
    # Spread them across the full parallelism before the kernels run.
    n_parts = int(
        records.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    phase1 = (
        pairs.repartition(n_parts, "conv_a")
        .join(la, "conv_a")
        .join(lb, "conv_b")
        .withColumn(
            "cos_tokens", token_overlap_cosine_expr(F.col("tokens_a"), F.col("tokens_b"))
        )
        .where(F.col("cos_tokens") >= PREFILTER_FLOOR)
        .withColumn(
            "lev_sim", lev_sim_expr(F.col("txt_a"), F.col("txt_b"), cfg.lev_prefix_chars)
        )
        .withColumn("jw_sim", jw_expr(F.col("txt_a"), F.col("txt_b"), cfg.jw_prefix_chars))
        .select("conv_a", "conv_b", "cos_tokens", "lev_sim", "jw_sim")
    )

    vecs = records.select("conv_id", "vec_idx", "vec_val")
    va = vecs.select(
        F.col("conv_id").alias("conv_a"), F.col("vec_idx").alias("vec_idx_a"),
        F.col("vec_val").alias("vec_val_a"),
    )
    vb = vecs.select(
        F.col("conv_id").alias("conv_b"), F.col("vec_idx").alias("vec_idx_b"),
        F.col("vec_val").alias("vec_val_b"),
    )
    scored = (
        phase1.join(va, "conv_a")
        .join(vb, "conv_b")
        .withColumn(
            "cos_tfidf",
            sparse_cosine_udf(
                F.col("vec_idx_a"), F.col("vec_val_a"), F.col("vec_idx_b"), F.col("vec_val_b")
            ),
        )
        .withColumn(
            "score",
            cfg.w_jaro_winkler * F.col("jw_sim")
            + cfg.w_levenshtein * F.col("lev_sim")
            + cfg.w_cosine * F.col("cos_tfidf"),
        )
    )
    return scored.select(
        "conv_a", "conv_b", "cos_tokens", "lev_sim", "jw_sim", "cos_tfidf", "score"
    )


def edges_from_scores(scored: DataFrame, threshold: float) -> DataFrame:
    """Thresholded match edges feeding connected components."""
    return scored.where(F.col("score") >= threshold).select(
        F.col("conv_a").alias("src"), F.col("conv_b").alias("dst"), "score"
    )
