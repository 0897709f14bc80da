"""Canonical selection fixtures (FIXTURES.md F6) + chain numbering."""

import pyspark.sql.functions as F

from entity_resolver_spark.operators.canonical import (
    canonical_by_centrality,
    canonical_by_frequency,
    chain_numbering,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "cluster string, norm_text string")


def test_single_unique_name(spark):
    df = _df(spark, [("g1", "only name")] * 3)
    got = canonical_by_centrality(df).collect()
    assert got == [("g1", "only name")] or got[0]["canonical_text"] == "only name"


def test_frequency_winner(spark):
    rows = [("g1", "acme corp")] * 5 + [("g1", "acme corporation")] * 1
    got = canonical_by_frequency(_df(spark, rows)).first()
    assert got["canonical_text"] == "acme corp"


def test_centrality_winner_full_form(spark):
    # the rare full form sits 'between' frequent abbreviations: centrality
    # plus length bonus beats raw frequency (reference K7 semantics)
    # equal frequencies: the full form is closest to BOTH abbreviations
    # (highest centrality) and longest, so (centrality+freq)*length wins
    rows = (
        [("g1", "international business machines")] * 2
        + [("g1", "international business mach")] * 2
        + [("g1", "intl business machines")] * 2
    )
    got = canonical_by_centrality(_df(spark, rows)).first()
    assert got["canonical_text"] == "international business machines"


def test_deterministic_tiebreak(spark):
    rows = [("g1", "aaa bbb"), ("g1", "ccc ddd")]  # same freq, same length
    a = canonical_by_centrality(_df(spark, rows)).first()["canonical_text"]
    b = canonical_by_centrality(_df(spark, rows)).first()["canonical_text"]
    assert a == b  # stable across runs


def test_chain_numbering(spark):
    df = spark.createDataFrame(
        [("acme", "k1"), ("acme", "k2"), ("acme", "k3"), ("solo", "k9")],
        "name string, addr string",
    )
    got = {
        (r["name"], r["addr"]): r["numbered_name"]
        for r in chain_numbering(df, "name", "addr").collect()
    }
    assert got[("acme", "k1")] == "acme - 1"
    assert got[("acme", "k3")] == "acme - 3"
    assert got[("solo", "k9")] == "solo"
