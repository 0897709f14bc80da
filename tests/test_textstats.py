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


def test_portable_fingerprint_matches_duckdb(spark):
    """poly_hash winnowing must produce IDENTICAL values in DuckDB —
    the exact contract the driver's doc_fingerprint oracle relies on."""
    import duckdb
    import pandas as pd
    import pyspark.sql.functions as F

    from entity_resolver_spark.operators.textstats import fingerprint_expr

    texts = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "hello world",
        "a b c d e f g h i j k l m n o p q r s t",
        "Punctuation, should; be! stripped?? and CASE folded - right 42",
        "one two",
    ]
    pdf = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    sdf = spark.createDataFrame(pdf)
    fp = fingerprint_expr(F.col("text"), portable=True)
    got = {
        r["doc_id"]: (r["n"], r["s"])
        for r in sdf.select(
            "doc_id",
            F.size(fp).alias("n"),
            F.aggregate(fp, F.lit(0).cast("long"), lambda a, x: a + x).alias("s"),
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    oracle = con.execute("""
        WITH w AS (
          SELECT doc_id,
                 list_filter(
                   string_split_regex(
                     lower(regexp_replace(text, '[^a-zA-Z0-9'' ]', ' ', 'g')), '\\s+'),
                   t -> length(t) > 0) AS words
          FROM documents
        ), g AS (
          SELECT doc_id,
                 CASE WHEN len(words) >= 3 THEN
                   list_transform(range(1, len(words) - 1),
                                  i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2])
                 ELSE [list_aggregate(words, 'string_agg', ' ')] END AS grams
          FROM w
        ), h AS (
          SELECT doc_id,
                 list_transform(grams, s ->
                   CASE WHEN s IS NULL OR length(s) = 0 THEN 0
                   ELSE list_reduce(
                     list_transform(range(1, length(s) + 1),
                                    i -> CAST(ascii(substring(s, i, 1)) AS BIGINT)),
                     (a, b) -> (a * 31 + b) % 1000000007) END) AS gh
          FROM g
        ), fp AS (
          SELECT doc_id,
                 list_sort(list_distinct(
                   list_transform(range(0, greatest(len(gh) - 8, 0) + 1),
                                  i -> list_min(gh[i+1 : i+8])))) AS f
          FROM h
        )
        SELECT doc_id, CAST(len(f) AS INT) AS n, CAST(list_aggregate(f, 'sum') AS BIGINT) AS s
        FROM fp
    """).fetchall()
    assert {r[0]: (r[1], r[2]) for r in oracle} == got


def test_default_fingerprint_unchanged_by_portable_flag_presence(spark):
    """The production default still uses xxhash64 (better dispersion)."""
    import pyspark.sql.functions as F

    from entity_resolver_spark.operators.textstats import fingerprint_expr

    df = spark.createDataFrame([("alpha beta gamma delta epsilon zeta",)], "text string")
    a = df.select(fingerprint_expr(F.col("text")).alias("f")).first()["f"]
    b = df.select(fingerprint_expr(F.col("text"), portable=True).alias("f")).first()["f"]
    assert a != b  # different hash families
    assert all(0 <= x < 1_000_000_007 for x in b)  # portable stays in the field
