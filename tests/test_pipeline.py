"""End-to-end pipeline: F1 >= 0.99 (north rule), gates, determinism,
resume (FIXTURES.md F9)."""

import tempfile

import pyspark.sql.functions as F
import pytest

from entity_resolver_spark import EntityResolverPipeline, ResolverConfig
from entity_resolver_spark.operators.validate import q1_violations


@pytest.fixture(scope="module")
def resolved(spark, corpus):
    turns, _ = corpus
    pipe = EntityResolverPipeline()
    res = pipe.resolve(spark, turns)
    res.cache().count()
    return res, pipe


def _prf1(res, labeled):
    cl = res.select("conv_id", "cluster")
    j = (
        labeled.join(
            cl.withColumnRenamed("conv_id", "conv_id_a").withColumnRenamed("cluster", "ca"),
            "conv_id_a",
        ).join(
            cl.withColumnRenamed("conv_id", "conv_id_b").withColumnRenamed("cluster", "cb"),
            "conv_id_b",
        )
    ).cache()
    tp = j.filter("is_match and ca = cb").count()
    fp = j.filter("not is_match and ca = cb").count()
    fn = j.filter("is_match and ca != cb").count()
    p = tp / (tp + fp) if tp + fp else 1.0
    r = tp / (tp + fn) if tp + fn else 1.0
    return p, r, 2 * p * r / (p + r)


def test_pairwise_f1_at_least_0_99(resolved, corpus):
    _, labeled = corpus
    res, _ = resolved
    p, r, f1 = _prf1(res, labeled)
    assert f1 >= 0.99, f"P={p:.4f} R={r:.4f} F1={f1:.4f}"


def test_q1_gate_holds(resolved):
    res, _ = resolved
    assert q1_violations(res).count() == 0


def test_every_conversation_present_exactly_once(resolved, corpus):
    turns, _ = corpus
    res, _ = resolved
    n_convs = turns.select("conv_id").distinct().count()
    assert res.count() == n_convs
    assert res.select("conv_id").distinct().count() == n_convs


def test_confidence_in_range_and_categorized(resolved):
    res, _ = resolved
    bad = res.where(
        (F.col("confidence_score") < 0) | (F.col("confidence_score") > 1)
        | F.col("confidence_category").isNull()
    ).count()
    assert bad == 0


def test_canonical_text_nonnull(resolved):
    res, _ = resolved
    assert res.where(F.col("canonical_text").isNull()).count() == 0


def test_determinism_two_runs(spark, corpus, resolved):
    turns, _ = corpus
    res1, _ = resolved
    res2 = EntityResolverPipeline().resolve(spark, turns)
    d = res1.select("conv_id", "cluster").exceptAll(res2.select("conv_id", "cluster")).count()
    assert d == 0


def test_stage_metrics_recorded(resolved):
    _, pipe = resolved
    stages = [m["stage"] for m in pipe.metrics]
    assert stages == [
        "collapse", "normalize", "token_stats", "pairs", "vectorize",
        "pair_scores", "edges", "components", "clustered", "canonical",
        "resolved",
    ]
    assert all(m["rows"] >= 0 for m in pipe.metrics)
