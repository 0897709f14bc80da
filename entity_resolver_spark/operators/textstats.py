"""Text-analysis operators for training-data curation (brief:
language-ID, quality scoring, token counting, fingerprinting) — all
pure column expressions (whole-stage codegen, no Python).

These run over a documents table (doc_id, text) and are deliberately
SQL-expressible so DuckDB oracles can cross-check them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword heuristic
_LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "you"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"],
    "fr": ["le", "la", "les", "et", "est", "pas", "pour", "que", "une", "dans"],
    "es": ["el", "la", "los", "que", "es", "no", "por", "con", "una", "para"],
}


def words_expr(text: Column) -> Column:
    w = F.split(F.lower(F.regexp_replace(text, r"[^a-zA-Z0-9' ]", " ")), r"\s+")
    return F.filter(w, lambda t: F.length(t) > 0)


def token_count_expr(text: Column) -> Column:
    """Whitespace token count (cheap proxy for LLM token budgeting)."""
    return F.size(words_expr(text))


def bpe_ish_token_count_expr(text: Column) -> Column:
    """BPE-ish token estimate: word-piece count where each word
    contributes ceil(len/4) pieces plus standalone punctuation/digit
    runs — a deterministic, SQL-only approximation of subword counts."""
    words = words_expr(text)
    word_pieces = F.aggregate(
        words, F.lit(0), lambda acc, t: acc + F.ceil(F.length(t) / 4.0).cast("int")
    )
    punct_runs = F.size(
        F.filter(F.split(text, r"[a-zA-Z0-9\s]+"), lambda t: F.length(t) > 0)
    )
    return word_pieces + punct_runs


def quality_score_expr(text: Column) -> Column:
    """Document quality in [0,1] from length / punctuation ratio /
    stopword ratio / mean word length (the classic pre-train filters).
    Weights: length .3, punct .2, stopword .3, word-shape .2."""
    n_chars = F.length(text)
    words = words_expr(text)
    n_words = F.size(words)
    # length factor: saturates at 200 words
    len_f = F.least(n_words.cast("double") / 200.0, F.lit(1.0))
    # punctuation ratio: penalize > 20%
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars).otherwise(1.0)
    punct_f = F.greatest(F.lit(0.0), 1.0 - punct_ratio * 5.0)
    # english stopword ratio: healthy prose ~ 0.2-0.6
    sw = F.array([F.lit(s) for s in _LANG_STOPWORDS["en"]])
    n_sw = F.size(F.filter(words, lambda t: F.array_contains(sw, t)))
    sw_ratio = F.when(n_words > 0, n_sw.cast("double") / n_words).otherwise(0.0)
    sw_f = F.least(sw_ratio * 4.0, F.lit(1.0))
    # mean word length factor: 3..10 chars is normal
    mean_wl = F.when(n_words > 0,
                     F.aggregate(words, F.lit(0), lambda a, t: a + F.length(t)).cast("double") / n_words
                     ).otherwise(0.0)
    wl_f = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.3)
    return 0.3 * len_f + 0.2 * punct_f + 0.3 * sw_f + 0.2 * wl_f


def lang_id_expr(text: Column) -> Column:
    """Stopword-vote language ID over {en,de,fr,es}, 'und' (undetermined)
    when no list scores >= 2 hits. Deterministic tie-break by language
    code order en<de<fr<es via score desc, code asc."""
    words = words_expr(text)

    def _hits(sws: list[str]):
        # factory closure: a default-arg lambda changes PySpark lambda
        # arity and binds the array index instead of the stopword list
        arr = F.array([F.lit(s) for s in sws])
        return F.size(F.filter(words, lambda t: F.array_contains(arr, t)))

    scores = []
    for code, sws in _LANG_STOPWORDS.items():
        scores.append(
            F.struct(
                _hits(sws).alias("hits"),
                F.lit({"en": 0, "de": 1, "fr": 2, "es": 3}[code]).alias("ord"),
                F.lit(code).alias("code"),
            )
        )
    # max by (hits desc, ord asc): flip ord sign inside a sortable struct
    best = F.array_max(
        F.transform(
            F.array(*scores),
            lambda s: F.struct(
                s["hits"].alias("hits"), (-s["ord"]).alias("nord"), s["code"].alias("code")
            ),
        )
    )
    return F.when(best["hits"] >= 2, best["code"]).otherwise(F.lit("und"))


def token_stats_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, n_tokens, n_tokens_bpe) — value-identical to
    token_count_expr / bpe_ish_token_count_expr, but computed by
    exploding the word array once and aggregating with codegen'd SUMs
    (guide §4.1: the higher-order F.aggregate/F.filter chain is
    evaluated interpreted per element). Integer counts are exact, so
    the outputs match the expression forms bit-for-bit."""
    t = F.col(text_col)
    ex = docs.select(F.col(id_col), F.explode_outer(words_expr(t)).alias("w"))
    agg = ex.groupBy(id_col).agg(
        F.count("w").cast("int").alias("n_tokens"),
        F.coalesce(
            F.sum(F.ceil(F.length("w") / 4.0).cast("int")), F.lit(0)
        ).cast("int").alias("__pieces"),
    )
    punct_runs = F.size(
        F.filter(F.split(t, r"[a-zA-Z0-9\s]+"), lambda x: F.length(x) > 0)
    )
    base = docs.select(F.col(id_col), punct_runs.alias("__punct_runs"))
    return base.join(agg, id_col).select(
        F.col(id_col),
        F.col("n_tokens"),
        (F.col("__pieces") + F.col("__punct_runs")).alias("n_tokens_bpe"),
    )


def quality_lang_table(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, quality, lang_pred) — value-identical to quality_score_expr
    / lang_id_expr (same count inputs, same double-arithmetic order,
    same struct-max tie-break), computed via one explode + codegen'd
    conditional-sum aggregates instead of interpreted per-word
    higher-order filters (4 stopword lists x 10 words each = ~40
    interpreted comparisons per word in the old form)."""
    t = F.col(text_col)
    ex = docs.select(F.col(id_col), F.explode_outer(words_expr(t)).alias("w"))
    hit_aggs = [
        F.coalesce(
            F.sum(F.col("w").isin(sws).cast("int")), F.lit(0)
        ).cast("int").alias(f"__h_{code}")
        for code, sws in _LANG_STOPWORDS.items()
    ]
    agg = ex.groupBy(id_col).agg(
        F.count("w").cast("int").alias("__n_words"),
        F.coalesce(F.sum(F.length("w")), F.lit(0)).cast("int").alias("__sum_wl"),
        *hit_aggs,
    )
    n_chars = F.length(t)
    n_punct = n_chars - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    base = docs.select(F.col(id_col), n_chars.alias("__n_chars"), n_punct.alias("__n_punct"))
    j = base.join(agg, id_col)

    n_words = F.col("__n_words")
    len_f = F.least(n_words.cast("double") / 200.0, F.lit(1.0))
    punct_ratio = F.when(
        F.col("__n_chars") > 0, F.col("__n_punct").cast("double") / F.col("__n_chars")
    ).otherwise(1.0)
    punct_f = F.greatest(F.lit(0.0), 1.0 - punct_ratio * 5.0)
    sw_ratio = F.when(n_words > 0, F.col("__h_en").cast("double") / n_words).otherwise(0.0)
    sw_f = F.least(sw_ratio * 4.0, F.lit(1.0))
    mean_wl = F.when(n_words > 0, F.col("__sum_wl").cast("double") / n_words).otherwise(0.0)
    wl_f = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.3)
    quality = 0.3 * len_f + 0.2 * punct_f + 0.3 * sw_f + 0.2 * wl_f

    lang_structs = [
        F.struct(
            F.col(f"__h_{code}").alias("hits"),
            F.lit(-{"en": 0, "de": 1, "fr": 2, "es": 3}[code]).alias("nord"),
            F.lit(code).alias("code"),
        )
        for code in _LANG_STOPWORDS
    ]
    best = F.greatest(*lang_structs)
    lang = F.when(best["hits"] >= 2, best["code"]).otherwise(F.lit("und"))
    return j.select(F.col(id_col), quality.alias("quality"), lang.alias("lang_pred"))


def poly_hash_expr(s: Column, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Deterministic polynomial string hash ((h*base + codepoint) % mod
    folded over the characters) — an engine-portable alternative to
    xxhash64: DuckDB computes the identical value with
    list_reduce(list_transform(range, ascii), ...), which is what makes
    the fingerprint oracle value-checkable. substr-per-index costs
    O(len^2), so use on short grams only (the winnowing 3-grams are
    ~20 chars). `base` selects an independent family member (31 and 37
    are combined into a 60-bit portable token hash by the simhash
    portable mode)."""
    return F.aggregate(
        F.sequence(F.lit(1), F.greatest(F.length(s), F.lit(1))),
        F.lit(0).cast("long"),
        lambda acc, i: F.pmod(acc * base + F.ascii(s.substr(i, F.lit(1))), F.lit(mod)),
    )


def fingerprint_expr(text: Column, window: int = 8, portable: bool = False) -> Column:
    """Winnowing-style document fingerprint: min hash over each sliding
    window of word 3-grams, collected as a sorted distinct array —
    robust to small edits, SQL-only. portable=True swaps xxhash64 for
    poly_hash_expr so a DuckDB oracle reproduces the exact values
    (xxhash64 exists only in Spark); the default stays xxhash64 — far
    better dispersion and O(len) per gram — for production use."""
    gram_hash = poly_hash_expr if portable else F.xxhash64
    words = words_expr(text)
    # zip_with chain (O(n)) instead of element_at-by-index (O(n^2))
    s2 = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(1)))
    s3 = F.slice(words, 3, F.greatest(F.size(words) - 2, F.lit(1)))
    tri = F.filter(
        F.zip_with(
            F.zip_with(words, s2, lambda a, b: F.concat(a, F.lit(" "), b)),
            s3,
            lambda ab, c: F.concat(ab, F.lit(" "), c),
        ),
        lambda x: x.isNotNull(),
    )
    grams = F.when(
        F.size(words) >= 3, F.transform(tri, lambda g: gram_hash(g))
    ).otherwise(F.array(gram_hash(F.concat_ws(" ", words))))
    mins = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(grams) - window, F.lit(0))),
        lambda i: F.array_min(F.slice(grams, i + 1, window)),
    )
    return F.array_sort(F.array_distinct(mins))


def doc_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach all text-analysis columns at once."""
    t = F.col(text_col)
    return (
        docs.withColumn("n_tokens", token_count_expr(t))
        .withColumn("n_tokens_bpe", bpe_ish_token_count_expr(t))
        .withColumn("quality", quality_score_expr(t))
        .withColumn("lang_pred", lang_id_expr(t))
        .withColumn("fingerprint", fingerprint_expr(t))
    )
