"""Incremental assignment — the reference's transform/predict path
(SURVEY G16; resolver.py:244-290, predictor.py:25-108).

New transcript turns are collapsed/normalized/vectorized with the SAME
operators as fit, then scored against the EXISTING resolved state's
cluster profiles: assign to the best profile above threshold, else
mint a new singleton cluster (id = own conv_id, deterministic). The
resolved state is the checkpointed output table — no pickled models,
which is what makes the pipeline resumable and the transform path a
pure join (reference needed fitted UMAP/HDBSCAN state instead)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from entity_resolver_spark.config import ResolverConfig
from entity_resolver_spark.functions.similarity import sparse_cosine_udf
from entity_resolver_spark.operators.collapse import collapse_turns
from entity_resolver_spark.operators.normalize import normalize_docs
from entity_resolver_spark.operators.refine import _top_slot_keys, cluster_profiles
from entity_resolver_spark.operators.vectorize import add_tfidf_vectors


def assign_new(
    spark: SparkSession,
    resolved: DataFrame,
    new_turns: DataFrame,
    config: ResolverConfig | None = None,
    assign_floor: float = 0.80,
) -> DataFrame:
    """resolved: output of EntityResolverPipeline.resolve (must carry
    conv_id, cluster, norm_text). new_turns: transcript rows for unseen
    conversations. Returns (conv_id, cluster, assigned boolean,
    match_cosine) for the new conversations."""
    cfg = config or ResolverConfig()

    collapsed = collapse_turns(new_turns).drop("turns")
    normalized = normalize_docs(
        collapsed,
        min_length=cfg.normalization.min_length,
        empty_fallback=cfg.normalization.empty_fallback,
    )
    new_vec = add_tfidf_vectors(
        normalized, tokens_col="match_tokens", num_features=cfg.scoring.tfidf_num_features
    )

    # existing state re-vectorized from its canonical texts (state is a
    # table, not a model; IDF differences wash out after L2+cosine)
    state = resolved.select("conv_id", "cluster", F.col("norm_text").alias("doc"))
    state_norm = state.withColumn("norm_text", F.col("doc")).withColumn(
        "match_tokens",
        F.expr("array_distinct(concat(split(norm_text, ' '), "
               "filter(zip_with(split(norm_text,' '), slice(split(norm_text,' '), 2, "
               "greatest(size(split(norm_text,' '))-1, 1)), (a,b) -> concat(a,'_',b)), "
               "x -> x is not null)))"),
    )
    state_vec = add_tfidf_vectors(
        state_norm, tokens_col="match_tokens", num_features=cfg.scoring.tfidf_num_features
    )
    prof = cluster_profiles(state_vec, "cluster")

    pkeys = prof.select(
        F.col("cluster").alias("cand_cluster"), "c_idx", "c_val",
        F.explode(_top_slot_keys(F.col("c_idx"), F.col("c_val"), 4)).alias("k"),
    )
    nkeys = new_vec.select(
        "conv_id", "vec_idx", "vec_val",
        F.explode(_top_slot_keys(F.col("vec_idx"), F.col("vec_val"), 4)).alias("k"),
    )
    scored = (
        nkeys.join(pkeys, "k")
        .dropDuplicates(["conv_id", "cand_cluster"])
        .withColumn(
            "cos",
            sparse_cosine_udf(F.col("vec_idx"), F.col("vec_val"), F.col("c_idx"), F.col("c_val")),
        )
    )
    w = W.partitionBy("conv_id").orderBy(F.col("cos").desc(), F.col("cand_cluster").asc())
    best = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("conv_id", "cand_cluster", F.col("cos").alias("match_cosine"))
    )
    return (
        new_vec.select("conv_id")
        .join(best, "conv_id", "left")
        .withColumn("assigned", F.col("match_cosine") >= assign_floor)
        .withColumn(
            "cluster",
            F.when(F.col("assigned"), F.col("cand_cluster")).otherwise(F.col("conv_id")),
        )
        .fillna({"assigned": False})
        .select("conv_id", "cluster", "assigned", "match_cosine")
    )
