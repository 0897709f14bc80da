"""Text-analysis expressions: token counts, quality, lang-id,
fingerprint robustness."""

import pyspark.sql.functions as F
import pytest

from entity_resolver_spark.operators.textstats import doc_stats


@pytest.fixture(scope="module")
def stats(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog and runs to the garden"),
        (2, "der hund ist nicht mit der katze und das ist ein problem zu haben"),
        (3, "le chat est dans la maison et les oiseaux sont pour le jardin"),
        (4, "el perro es una mascota que vive con los gatos por la casa"),
        (5, "!!! ??? ### $$$ %%%"),
        (6, ""),
        (7, "word"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in doc_stats(df).collect()}


def test_token_count(stats):
    assert stats[1]["n_tokens"] == 14
    assert stats[6]["n_tokens"] == 0
    assert stats[7]["n_tokens"] == 1


def test_bpe_ish_monotone_and_geq_words(stats):
    for d in (1, 2, 3, 4):
        assert stats[d]["n_tokens_bpe"] >= stats[d]["n_tokens"]


def test_lang_id(stats):
    assert stats[1]["lang_pred"] == "en"
    assert stats[2]["lang_pred"] == "de"
    assert stats[3]["lang_pred"] == "fr"
    assert stats[4]["lang_pred"] == "es"
    assert stats[5]["lang_pred"] == "und"


def test_quality_ordering(stats):
    # real prose beats punctuation soup and empty docs
    assert stats[1]["quality"] > stats[5]["quality"]
    assert stats[1]["quality"] > stats[6]["quality"]
    assert 0.0 <= stats[5]["quality"] <= 1.0


def test_fingerprint_robust_to_small_edit(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 3
    b = a.replace("kappa", "kappa2", 1)  # one token changed
    c = "totally unrelated words describing some other document entirely here"
    df = spark.createDataFrame([(1, a), (2, b), (3, c)], "doc_id long, text string")
    fp = {r["doc_id"]: set(r["fingerprint"]) for r in doc_stats(df).collect()}
    overlap_ab = len(fp[1] & fp[2]) / len(fp[1] | fp[2])
    overlap_ac = len(fp[1] & fp[3]) / len(fp[1] | fp[3])
    assert overlap_ab > 0.5          # small edit -> mostly shared fingerprint
    assert overlap_ac == 0.0         # unrelated -> disjoint
