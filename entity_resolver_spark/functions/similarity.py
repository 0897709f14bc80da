"""Pairwise similarity kernels (SURVEY K1-K3).

Reference kernels live in /root/reference/entity_resolver/utils/
similarity.py (normalized Levenshtein 128-168, TF-IDF cosine 213-400,
embedding cosine 522-613). Spark-first split:

  * Levenshtein similarity exp(-2*lev/(len_a+len_b)) — pure SQL via the
    built-in JVM levenshtein() (whole-stage codegen, no Python at all);
  * Jaro-Winkler — no Spark builtin; Arrow-batched pandas UDF with a
    tight per-pair scorer (strings are length-capped upstream). Matches
    DuckDB's jaro_winkler_similarity (boost threshold 0.7, prefix
    weight 0.1) so the oracle can cross-check it;
  * token-set cosine over hashed TF-IDF — sparse vectors built fully
    JVM-side (explode -> idf join -> slot hash -> re-collect, see
    vectorize.py); the pair dot product is an Arrow-batched NumPy UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------------------
# K1: normalized Levenshtein similarity — pure SQL
# ---------------------------------------------------------------------------

def lev_sim_expr(a: Column, b: Column, prefix_chars: int = 256) -> Column:
    """exp(-2*lev/(len_a+len_b)) on length-capped inputs (reference
    utils/similarity.py:128-168). Identical strings -> 1.0; two empty
    strings -> 1.0 (reference returns 1 for zero denominator)."""
    xa, xb = F.substring(a, 1, prefix_chars), F.substring(b, 1, prefix_chars)
    denom = F.length(xa) + F.length(xb)
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.exp(-2.0 * F.levenshtein(xa, xb) / denom)
    )


# ---------------------------------------------------------------------------
# Jaro-Winkler — Arrow-batched UDF (standard definition, DuckDB-compatible)
# ---------------------------------------------------------------------------

def jaro_winkler_py(s1: str, s2: str) -> float:
    """Standard Jaro-Winkler (prefix weight 0.1, boost threshold 0.7)."""
    len1, len2 = len(s1), len(s2)
    if len1 == 0 or len2 == 0:
        return 0.0  # DuckDB convention: empty vs anything (incl. empty) -> 0
    if s1 == s2:
        return 1.0
    match_window = max(len1, len2) // 2 - 1
    if match_window < 0:
        match_window = 0
    f1 = np.zeros(len1, dtype=bool)
    f2 = np.zeros(len2, dtype=bool)
    matches = 0
    for i in range(len1):
        lo = max(0, i - match_window)
        hi = min(len2, i + match_window + 1)
        for j in range(lo, hi):
            if not f2[j] and s1[i] == s2[j]:
                f1[i] = f2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(len1):
        if f1[i]:
            while not f2[k]:
                k += 1
            if s1[i] != s2[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (matches / len1 + matches / len2 + (matches - t) / matches) / 3.0
    if jaro <= 0.7:
        return jaro
    prefix = 0
    for i in range(min(4, len1, len2)):
        if s1[i] == s2[i]:
            prefix += 1
        else:
            break
    return jaro + prefix * 0.1 * (1.0 - jaro)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    return pd.Series(
        [
            jaro_winkler_py(x, y) if x is not None and y is not None else None
            for x, y in zip(a, b)
        ],
        dtype="float64",
    )


def jw_expr(a: Column, b: Column, prefix_chars: int = 64) -> Column:
    """Jaro-Winkler on length-capped inputs (JW is prefix-dominated;
    capping bounds the O(n*m) match loop for long transcripts)."""
    return jaro_winkler_udf(F.substring(a, 1, prefix_chars), F.substring(b, 1, prefix_chars))


# ---------------------------------------------------------------------------
# K2/K3: sparse/dense cosine — Arrow-batched NumPy
# ---------------------------------------------------------------------------

@F.pandas_udf(T.DoubleType())
def sparse_cosine_udf(
    ia: pd.Series, va: pd.Series, ib: pd.Series, vb: pd.Series
) -> pd.Series:  # pragma: no cover
    """Dot product of two L2-normalized sparse vectors given as
    (sorted index array, value array) pairs. Arrow hands each column as
    a Series of numpy arrays; per pair we intersect the index sets."""
    out = np.empty(len(ia), dtype="float64")
    for n, (xi, xv, yi, yv) in enumerate(zip(ia, va, ib, vb)):
        if xi is None or yi is None or len(xi) == 0 or len(yi) == 0:
            out[n] = 0.0
            continue
        xi = np.asarray(xi, dtype=np.int64)
        yi = np.asarray(yi, dtype=np.int64)
        common, ax, ay = np.intersect1d(xi, yi, assume_unique=True, return_indices=True)
        if len(common) == 0:
            out[n] = 0.0
        else:
            out[n] = float(
                np.dot(
                    np.asarray(xv, dtype=np.float64)[ax],
                    np.asarray(yv, dtype=np.float64)[ay],
                )
            )
    return pd.Series(out)


def dense_cosine_expr(a: Column, b: Column) -> Column:
    """Cosine of two dense float arrays — pure SQL (zip_with + aggregate),
    reference analog utils/similarity.py:522-613."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))
    return F.when((na == 0) | (nb == 0), F.lit(0.0)).otherwise(dot / (na * nb))


def token_overlap_cosine_expr(tokens_a: Column, tokens_b: Column) -> Column:
    """Binary token-set cosine (Ochiai): |A∩B| / sqrt(|A||B|) — cheap
    JVM-only prefilter used before the weighted TF-IDF cosine."""
    inter = F.size(F.array_intersect(tokens_a, tokens_b)).cast("double")
    return F.when(
        (F.size(tokens_a) == 0) | (F.size(tokens_b) == 0), F.lit(0.0)
    ).otherwise(inter / F.sqrt(F.size(tokens_a).cast("double") * F.size(tokens_b).cast("double")))
