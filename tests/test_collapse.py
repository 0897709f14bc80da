"""Collapse operator: stable (conv_id, turn_idx) ordering + per-turn
text equality invariant (BASELINE input_hint)."""

import pyspark.sql.functions as F

from entity_resolver_spark.operators.collapse import (
    collapse_turns,
    explode_back,
    integrity_violations,
)


def test_doc_is_turn_ordered_concat(spark):
    rows = [
        ("c1", 2, "user", "third", "", None),
        ("c1", 0, "user", "first", "", None),
        ("c1", 1, "assistant", "second", "search", None),
        ("c2", 0, "user", "solo", "", None),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
    out = {r["conv_id"]: r for r in collapse_turns(df).collect()}
    assert out["c1"]["doc"] == "first second third"
    assert out["c1"]["n_turns"] == 3
    assert out["c2"]["doc"] == "solo"
    assert out["c1"]["tools"] == ["search"]
    assert sorted(out["c1"]["roles"]) == ["assistant", "user"]


def test_integrity_roundtrip_on_shuffled_corpus(spark, corpus):
    turns, _ = corpus
    collapsed = collapse_turns(turns)
    assert integrity_violations(turns, collapsed).count() == 0
    # explode_back reproduces the exact source rows
    back = explode_back(collapsed).select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    src = turns.select("conv_id", "turn_idx", "role", "text", "tool", "ts")
    assert back.exceptAll(src).count() == 0
    assert src.exceptAll(back).count() == 0


def test_collapse_never_mutates_text(spark):
    # unicode-messy text must appear verbatim in doc
    messy = "smart ’quote’ and ﬁ ligature and ｆｕｌｌｗｉｄｔｈ"
    df = spark.createDataFrame(
        [("c1", 0, "user", messy, "", None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    assert collapse_turns(df).first()["doc"] == messy
