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
from entity_resolver_spark.operators.vectorize import add_tfidf_vectors
from entity_resolver_spark.lineage import eager_cut


def derive_fitted_state(
    resolved: DataFrame, config: ResolverConfig | None = None
) -> dict[str, DataFrame]:
    """Build the transform-side fitted state ONCE from the resolved
    table: the fitted IDF, the state blocking keys, and the state
    member vectors (reference analog: fitted vectorizers/encoders,
    vectorizer.py:188-239; here the 'model' is three tables).

    r1 re-derived all of this inside every assign_new call — O(state)
    work per transform batch. Calling this at fit/save time and passing
    the result to assign_new makes each transform touch only batch-sized
    data plus these precomputed tables."""
    cfg = config or ResolverConfig()
    from entity_resolver_spark.operators.blocking import blocking_keys
    from entity_resolver_spark.operators.vectorize import idf_table

    # state re-tokenized from its stored norm_text (state is a table,
    # not a model) with the SAME expression fit uses — one source of
    # truth: if normalize.match_tokens_expr changes, transform-side
    # vectors change with it instead of silently diverging
    from entity_resolver_spark.operators.normalize import match_tokens_expr

    state_norm = resolved.select("conv_id", "cluster", "norm_text").withColumn(
        "match_tokens", match_tokens_expr(F.col("norm_text"))
    )
    fitted_idf = idf_table(state_norm, "match_tokens").transform(eager_cut)
    state_vec = add_tfidf_vectors(
        state_norm, tokens_col="match_tokens",
        num_features=cfg.scoring.tfidf_num_features, idf=fitted_idf,
    ).select("conv_id", "cluster", "vec_idx", "vec_val")
    skeys = blocking_keys(
        # the fitted-state channels run on match_tokens only — disable
        # C4 explicitly (these frames deliberately carry no unigram col)
        state_norm, cfg.blocking.model_copy(update={"unigrams_col": None}),
        "match_tokens", df_table=fitted_idf.select("token", "df"),
    )
    return {"idf": fitted_idf, "state_keys": skeys, "state_vec": state_vec}


def assign_new(
    spark: SparkSession,
    resolved: DataFrame,
    new_turns: DataFrame,
    config: ResolverConfig | None = None,
    assign_floor: float = 0.80,
    fitted: dict[str, DataFrame] | None = None,
) -> DataFrame:
    """resolved: output of EntityResolverPipeline.resolve (must carry
    conv_id, cluster, norm_text). new_turns: transcript rows for unseen
    conversations. Returns (conv_id, cluster, assigned boolean,
    match_cosine) for the new conversations.

    Pass `fitted` (from derive_fitted_state, possibly reloaded from a
    save() directory) so repeated transform batches skip the O(state)
    re-derivation; omitted, it is derived here (one-shot path)."""
    cfg = config or ResolverConfig()

    collapsed = collapse_turns(new_turns).drop("turns")
    normalized = normalize_docs(
        collapsed,
        min_length=cfg.normalization.min_length,
        empty_fallback=cfg.normalization.empty_fallback,
    )

    # The STATE's document frequencies are the fitted IDF (reference
    # transform uses fitted vectorizers, vectorizer.py:188-239): BOTH
    # sides vectorize against this one table, so an exact duplicate of
    # a known conversation gets the identical vector (a per-side IDF
    # would degenerate to uniform weights on a small new batch and
    # prune different top slots). Unseen tokens drop out, exactly like
    # an OOV token under a fitted vocabulary.
    if fitted is None:
        fitted = derive_fitted_state(resolved, cfg)
    fitted_idf = fitted["idf"]
    new_vec = add_tfidf_vectors(
        normalized, tokens_col="match_tokens",
        num_features=cfg.scoring.tfidf_num_features, idf=fitted_idf,
    )
    # candidate generation reuses the SAME blocking channels as fit
    # (an identical document produces identical det/MinHash keys by
    # construction, and the rare channel uses the fitted df table on
    # both sides so "rare" means rare-in-state). Centroid-top-slot
    # keys were tried first and fail structurally: a perturbed
    # record's own top slots are its unique max-IDF noise tokens, not
    # the family-shared slots that dominate the centroid.
    from entity_resolver_spark.operators.blocking import blocking_keys

    nkeys = blocking_keys(
        normalized, cfg.blocking.model_copy(update={"unigrams_col": None}),
        "match_tokens", df_table=fitted_idf.select("token", "df"),
    )
    cand = (
        nkeys.join(
            fitted["state_keys"].select(
                F.col("conv_id").alias("member_id"), "block_key"
            ),
            "block_key",
        )
        .select("conv_id", "member_id")
        .distinct()
    )
    member_vec = fitted["state_vec"].select(
        F.col("conv_id").alias("member_id"), "cluster",
        F.col("vec_idx").alias("m_idx"), F.col("vec_val").alias("m_val"),
    )
    scored = (
        cand.join(member_vec, "member_id")
        .join(new_vec.select("conv_id", "vec_idx", "vec_val"), "conv_id")
        .withColumn(
            "cos",
            sparse_cosine_udf(F.col("vec_idx"), F.col("vec_val"), F.col("m_idx"), F.col("m_val")),
        )
        # best member per (new record, cluster) = the cluster's score
        .groupBy("conv_id", "cluster")
        .agg(F.max("cos").alias("cos"))
    )
    w = W.partitionBy("conv_id").orderBy(F.col("cos").desc(), F.col("cluster").asc())
    best = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("conv_id", F.col("cluster").alias("cand_cluster"), F.col("cos").alias("match_cosine"))
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
