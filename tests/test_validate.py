"""Invariant gates Q1/Q2 and identical-entity consolidation."""

import pyspark.sql.functions as F

from entity_resolver_spark.operators.validate import (
    consolidate_identical,
    q1_violations,
    q2_violations,
)


def test_q1_detects_cross_cluster_duplicates(spark):
    df = spark.createDataFrame(
        [("same text", "c1"), ("same text", "c2"), ("other", "c3")],
        "norm_text string, cluster string",
    )
    bad = q1_violations(df).collect()
    assert len(bad) == 1 and bad[0]["norm_text"] == "same text"


def test_consolidate_identical_merges_and_clears_q1(spark):
    df = spark.createDataFrame(
        [("k1", "c1"), ("k1", "c2"), ("k2", "c2"), ("k3", "c9")],
        "norm_text string, cluster string",
    )
    out = consolidate_identical(df)
    assert q1_violations(out).count() == 0
    got = {r["norm_text"]: r["cluster"] for r in out.collect()}
    assert got["k1"] == got["k2"] == "c1"  # min cluster id wins (deterministic)
    assert got["k3"] == "c9"


def test_q2_functional_dependency(spark):
    df = spark.createDataFrame(
        [("canon a", "c1"), ("canon a", "c2"), ("canon b", "c3")],
        "canonical_text string, cluster string",
    )
    bad = q2_violations(df).collect()
    assert len(bad) == 1 and bad[0]["canonical_text"] == "canon a"


def test_enforce_canonical_fd_repairs_and_is_deterministic(spark):
    from entity_resolver_spark.operators.validate import enforce_canonical_fd

    df = spark.createDataFrame(
        [
            ("a1", "canon a", "c1"),
            ("a2", "canon a", "c1"),
            ("b1", "canon a", "c2"),  # second cluster converged to same text
            ("c1x", "canon b", "c3"),
        ],
        "conv_id string, canonical_text string, cluster string",
    )
    out = enforce_canonical_fd(df)
    assert q2_violations(out).count() == 0
    got = {r["conv_id"]: r["canonical_text"] for r in out.collect()}
    # c1 has the min conv_id ('a1') -> keeps the unmodified text;
    # c2 gets the deterministic ' #2' suffix
    assert got["a1"] == got["a2"] == "canon a"
    assert got["b1"] == "canon a #2"
    assert got["c1x"] == "canon b"
    # idempotent / deterministic across calls
    out2 = enforce_canonical_fd(df)
    assert out.exceptAll(out2).count() == 0
