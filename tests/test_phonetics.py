"""V2/V3 phonetic encoding + S4 YAML config round trip."""

from __future__ import annotations

import pyspark.sql.functions as F

from entity_resolver_spark.config import ResolverConfig
from entity_resolver_spark.functions.phonetics import (
    add_phonetic_tokens,
    metaphone_py,
    metaphone_tokens_py,
)


def test_metaphone_equivalence_classes():
    same = [
        ("smith", "smyth"),
        ("knight", "night"),
        ("philip", "filip"),
        ("catherine", "katherine"),
        ("wright", "rite"),
    ]
    for a, b in same:
        assert metaphone_py(a) == metaphone_py(b), (a, b)
    diff = [("smith", "jones"), ("acme", "globex")]
    for a, b in diff:
        assert metaphone_py(a) != metaphone_py(b), (a, b)


def test_metaphone_tokens_caps_words():
    text = " ".join(f"word{i}" for i in range(30))
    assert len(metaphone_tokens_py(text, max_words=10)) == 10
    assert metaphone_tokens_py("", 10) == []
    assert metaphone_tokens_py("123 456", 10) == []  # non-alpha -> no codes


def test_spark_phonetic_tokens_matches_python(spark):
    rows = [("a", "smith and wesson holdings"), ("b", None), ("c", "knight rider")]
    df = spark.createDataFrame(rows, "id string, name string")
    got = {
        r["id"]: r["phonetic_tokens"]
        for r in add_phonetic_tokens(df, "name").collect()
    }
    assert got["a"] == metaphone_tokens_py("smith and wesson holdings")
    assert got["b"] == []
    assert got["c"] == metaphone_tokens_py("knight rider")


def test_yaml_config_roundtrip(tmp_path):
    cfg = ResolverConfig()
    cfg.blocking.rare_max_df = 33
    cfg.scoring.edge_threshold = 0.61
    p = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(p)
    back = ResolverConfig.from_yaml(p)
    assert back == cfg
    assert back.blocking.rare_max_df == 33
    assert back.scoring.edge_threshold == 0.61


def test_yaml_config_rejects_unknown_keys(tmp_path):
    import pytest

    p = tmp_path / "bad.yaml"
    p.write_text("blocking:\n  not_a_field: 1\n")
    with pytest.raises(Exception):
        ResolverConfig.from_yaml(str(p))
