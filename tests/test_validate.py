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
