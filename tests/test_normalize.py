"""Normalization pipeline unit fixtures (FIXTURES.md F3)."""

import pyspark.sql.functions as F
import pytest

from entity_resolver_spark.operators.normalize import (
    nfkc_fold_series,
    normalize_docs,
    normalize_py,
)

CASES = [
    # (raw, expected_norm, rule)
    ("ｆｕｌｌｗｉｄｔｈ ＴＥＸＴ", "fullwidth text", "nfkc"),
    ("ﬁnancial ﬂow", "financial flow", "nfkc-ligature"),
    ("Hello   World", "hello world", "whitespace"),
    ("don’t “quote” me", "don t quote me", "smart-punct"),
    ("zero​width‍join", "zerowidthjoin", "zero-width"),
    ("tabs\tand\nnewlines", "tabs and newlines", "control"),
    ("MIXED case Text", "mixed case text", "lower"),
    ("visit https://x.io/a?b=1 now", "visit urltoken now", "url"),
    ("mail bob@example.com ok", "mail emailtoken ok", "email"),
    ("punct!!! marks??? here...", "punct marks here", "punct"),
    ("x", "x", "too-short-guard"),  # minimal normalization path
    ("  !!!  ", "!!!", "guard-minimal-fallback"),  # minimal norm survives
    ("", "unknown_entity", "empty-guard"),
    ("   ", "unknown_entity", "whitespace-empty-guard"),
    ("café au lait", "caf au lait", "accent-drop"),  # NFKC keeps é; regex drops
]


@pytest.mark.parametrize("raw,expected,rule", CASES)
def test_normalize_py(raw, expected, rule):
    assert normalize_py(raw) == expected, rule


def test_spark_matches_python(spark):
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "doc string")
    out = normalize_docs(df).select("doc", "norm_text").collect()
    for row in out:
        assert row["norm_text"] == normalize_py(row["doc"]), row["doc"]


def test_distinct_first_path_equivalent(spark):
    rows = [("duplicate text ’x’",)] * 5 + [("another ＴＥＸＴ",)] * 3
    df = spark.createDataFrame(rows, "doc string")
    a = normalize_docs(df, distinct_first=False).select("norm_text")
    b = normalize_docs(df, distinct_first=True).select("norm_text")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_fold_table():
    s = nfkc_fold_series(__import__("pandas").Series(["a—b–c−d", "…", "x y"]))
    assert list(s) == ["a-b-c-d", "...", "x y"]


def test_tokens_and_bigrams(spark):
    df = spark.createDataFrame([("alpha beta gamma",)], "doc string")
    row = normalize_docs(df).first()
    assert row["tokens"] == ["alpha", "beta", "gamma"]
    assert set(row["match_tokens"]) == {
        "alpha", "beta", "gamma", "alpha_beta", "beta_gamma",
    }


def test_fitted_state_tokenization_matches_fit_side(spark):
    """Single source of truth (VERDICT r2 item 4): the transform-side
    state tokenization must be the SAME expression fit uses — compare
    normalize_docs' match_tokens against match_tokens_expr re-applied
    to the stored norm_text."""
    import pyspark.sql.functions as F

    from entity_resolver_spark.operators.normalize import match_tokens_expr, normalize_docs

    df = spark.createDataFrame(
        [("c1", "Hello, WORLD!  Order #123 again hello world"),
         ("c2", "one"),
         ("c3", "a b c d e f")],
        "conv_id string, doc string",
    )
    fit_side = normalize_docs(df)
    recomputed = fit_side.select(
        "conv_id", "match_tokens",
        match_tokens_expr(F.col("norm_text")).alias("state_tokens"),
    )
    bad = recomputed.where(F.col("match_tokens") != F.col("state_tokens")).count()
    assert bad == 0
