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

ATTR_COLS = ["conv_id", "norm_text", "tokens", "vec_idx", "vec_val"]


def score_pairs(
    records: DataFrame, pairs: DataFrame, cfg: ScoringConfig
) -> DataFrame:
    """pairs(conv_a, conv_b) -> scored pairs with individual kernel
    columns and the weighted `score` (all in [0,1])."""
    attrs = records.select(*ATTR_COLS)
    a = attrs.select([F.col(c).alias(f"{c}_a") for c in ATTR_COLS])
    b = attrs.select([F.col(c).alias(f"{c}_b") for c in ATTR_COLS])

    joined = (
        pairs.join(a, pairs["conv_a"] == a["conv_id_a"])
        .join(b, pairs["conv_b"] == b["conv_id_b"])
        .drop("conv_id_a", "conv_id_b")
    )

    pre = joined.withColumn(
        "cos_tokens", token_overlap_cosine_expr(F.col("tokens_a"), F.col("tokens_b"))
    ).where(F.col("cos_tokens") >= PREFILTER_FLOOR)

    scored = (
        pre.withColumn(
            "lev_sim",
            lev_sim_expr(F.col("norm_text_a"), F.col("norm_text_b"), cfg.lev_prefix_chars),
        )
        .withColumn(
            "jw_sim",
            jw_expr(F.col("norm_text_a"), F.col("norm_text_b"), cfg.jw_prefix_chars),
        )
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
