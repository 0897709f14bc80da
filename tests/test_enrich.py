"""G15 analog (metadata enrichment) + P10 analog (completeness)."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from entity_resolver_spark.operators.collapse import completeness_expr
from entity_resolver_spark.operators.refine import enrich_metadata

TS0 = dt.datetime(2025, 1, 1)
TS1 = dt.datetime(2025, 1, 2)


def test_enrich_metadata_fills_empty_tools_from_majority(spark):
    rows = [
        ("a", 1, ["search", "sql"]),
        ("b", 1, ["search", "sql"]),
        ("c", 1, ["browser"]),
        ("d", 1, []),           # gets majority ['search','sql']
        ("e", 2, []),           # cluster with no donors -> untouched
        ("f", 3, ["x"]),
    ]
    df = spark.createDataFrame(rows, "conv_id string, cluster long, tools array<string>")
    out = {r["conv_id"]: r for r in enrich_metadata(df).collect()}
    assert out["d"]["tools"] == ["search", "sql"]
    assert out["d"]["metadata_was_enriched"] is True
    assert out["e"]["tools"] == []
    assert out["e"]["metadata_was_enriched"] is False
    # non-empty rows untouched, not flagged
    assert out["c"]["tools"] == ["browser"]
    assert out["c"]["metadata_was_enriched"] is False


def test_enrich_metadata_deterministic_tie_break(spark):
    # two donor sets with equal frequency: lexicographically smaller wins
    rows = [
        ("a", 1, ["beta"]),
        ("b", 1, ["alpha"]),
        ("c", 1, []),
    ]
    df = spark.createDataFrame(rows, "conv_id string, cluster long, tools array<string>")
    out = {r["conv_id"]: r["tools"] for r in enrich_metadata(df).collect()}
    assert out["c"] == ["alpha"]


def test_completeness_expr_values(spark):
    rows = [
        # full marks: doc, 2 roles, tools, real time range
        ("a", "hello", ["user", "assistant"], ["sql"], TS0, TS1, 1.0),
        # no tools, single role, zero range
        ("b", "hi", ["user"], [], TS0, TS0, 0.4),
        # empty doc only
        ("c", "  ", ["user"], [], TS0, TS0, 0.0),
    ]
    df = spark.createDataFrame(
        [r[:6] for r in rows],
        "conv_id string, doc string, roles array<string>, tools array<string>, "
        "ts_min timestamp, ts_max timestamp",
    )
    got = {r["conv_id"]: r["c"] for r in df.select("conv_id", completeness_expr().alias("c")).collect()}
    for r in rows:
        assert abs(got[r[0]] - r[6]) < 1e-9, (r[0], got[r[0]], r[6])
