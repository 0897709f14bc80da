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
    strings -> 1.0 (reference returns 1 for zero denominator).

    r6: the integer distance comes from the native C kernel when a
    compiler exists (lev_expr) — the JVM builtin pays a full unstripped
    O(n*m) DP, ~30-80us per 128-char window pair, which dominated
    pair scoring at mega-family shapes. exp()/division unchanged, so
    the similarity doubles are identical."""
    xa, xb = F.substring(a, 1, prefix_chars), F.substring(b, 1, prefix_chars)
    denom = F.length(xa) + F.length(xb)
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.exp(-2.0 * lev_expr(xa, xb) / denom)
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


def jaro_winkler_batch(a: pd.Series, b: pd.Series, max_len: int = 64) -> pd.Series:
    """Batch-vectorized Jaro-Winkler: the greedy match loop runs over
    (position i, offset j) with every PAIR advanced simultaneously in
    NumPy — no per-row Python. Exactly matches jaro_winkler_py /
    DuckDB's jaro_winkler_similarity on capped inputs.

    Cost: O(L * (2W+1)) vector ops per batch (L=longest string,
    W=match window), independent of batch size."""
    n = len(a)
    out = np.zeros(n, dtype="float64")
    if n == 0:
        return pd.Series(out)

    def encode(s: pd.Series) -> tuple[np.ndarray, np.ndarray]:
        lens = np.fromiter(
            (0 if x is None else min(len(x), max_len) for x in s), np.int64, count=n
        )
        m = np.zeros((n, max(1, int(lens.max()))), dtype=np.uint32)
        for r, x in enumerate(s):
            if x:
                x = x[:max_len]
                m[r, : len(x)] = np.frombuffer(x.encode("utf-32-le"), dtype=np.uint32)
        return m, lens

    am, la = encode(a)
    bm, lb = encode(b)
    l1, l2 = am.shape[1], bm.shape[1]
    valid = (la > 0) & (lb > 0)
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)

    f1 = np.zeros((n, l1), dtype=bool)
    f2 = np.zeros((n, l2), dtype=bool)
    matches = np.zeros(n, dtype=np.int64)
    wmax = int(w.max()) if n else 0
    for i in range(l1):
        done = ~(valid & (i < la))  # pairs with no char at i never match here
        for j in range(max(0, i - wmax), min(l2, i + wmax + 1)):
            if done.all():
                break
            cand = (
                ~done
                & (j < lb)
                & (np.abs(j - i) <= w)
                & ~f2[:, j]
                & (am[:, i] == bm[:, j])
            )
            if cand.any():
                f1[cand, i] = True
                f2[cand, j] = True
                matches += cand
                done |= cand

    has = matches > 0
    if has.any():
        # transpositions: a-matched chars in i-order vs b-matched chars
        # in j-order, aligned per pair by construction
        r1, c1 = np.nonzero(f1)
        r2, c2 = np.nonzero(f2)
        mism = am[r1, c1] != bm[r2, c2]
        t = np.bincount(r1[mism], minlength=n) // 2
        m = matches.astype("float64")
        with np.errstate(divide="ignore", invalid="ignore"):
            jaro = np.where(
                has, (m / la + m / lb + (m - t) / np.where(m == 0, 1, m)) / 3.0, 0.0
            )
        # common prefix (<=4), only where jaro clears the boost threshold
        pref = np.zeros(n, dtype=np.int64)
        run = valid.copy()
        for i in range(min(4, l1, l2)):
            run = run & (i < la) & (i < lb) & (am[:, i] == bm[:, i])
            pref += run
        out = np.where(jaro > 0.7, jaro + pref * 0.1 * (1.0 - jaro), jaro)
        out = np.where(valid, out, 0.0)
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    # native C kernel when a compiler exists on the host (r6: ~20x the
    # NumPy lockstep kernel; bit-identical outputs — same op order on
    # IEEE doubles, verified in test_similarity); NumPy fallback kept
    # for compiler-less hosts.
    from entity_resolver_spark.functions import ckernels

    if ckernels.available():
        import pyarrow as pa

        return ckernels.jw_arrow(
            pa.Array.from_pandas(a), pa.Array.from_pandas(b)
        ).to_pandas()
    return jaro_winkler_batch(a, b)


@F.pandas_udf(T.IntegerType())
def lev_udf(a: pd.Series, b: pd.Series) -> pd.Series:  # pragma: no cover
    """Exact codepoint Levenshtein via the native C kernel (common
    prefix/suffix stripped before the DP — integer-exact, so callers
    get the same values as F.levenshtein)."""
    import pyarrow as pa

    from entity_resolver_spark.functions import ckernels

    d, _, _ = ckernels.lev_arrow(pa.Array.from_pandas(a), pa.Array.from_pandas(b))
    return d.to_pandas()


def lev_expr(a: Column, b: Column) -> Column:
    """Integer Levenshtein distance: the C kernel when a compiler
    exists (r6 — the JVM builtin pays a full unstripped O(n*m) DP per
    pair), F.levenshtein otherwise. Values are identical."""
    from entity_resolver_spark.functions import ckernels

    if ckernels.available():
        return lev_udf(a, b)
    return F.levenshtein(a, b)  # pragma: no cover - cc exists in CI/bench


def jw_expr(a: Column, b: Column, prefix_chars: int = 64) -> Column:
    """Jaro-Winkler on length-capped inputs (JW is prefix-dominated;
    capping bounds the O(n*m) match loop for long transcripts)."""
    return jaro_winkler_udf(F.substring(a, 1, prefix_chars), F.substring(b, 1, prefix_chars))


# ---------------------------------------------------------------------------
# K2/K3: sparse/dense cosine — Arrow-batched NumPy
# ---------------------------------------------------------------------------

def _flatten_side(idx: pd.Series, val: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Series-of-arrays -> (flat row ids, flat slots, flat values)."""
    lens = np.fromiter(
        (0 if x is None else len(x) for x in idx), dtype=np.int64, count=len(idx)
    )
    rows = np.repeat(np.arange(len(idx), dtype=np.int64), lens)
    nz = [np.asarray(x, dtype=np.int64) for x in idx if x is not None and len(x)]
    slots = np.concatenate(nz) if nz else np.empty(0, dtype=np.int64)
    nzv = [np.asarray(x, dtype=np.float64) for x in val if x is not None and len(x)]
    vals = np.concatenate(nzv) if nzv else np.empty(0, dtype=np.float64)
    return rows, slots, vals


def sparse_cosine_batch(
    ia: pd.Series, va: pd.Series, ib: pd.Series, vb: pd.Series
) -> pd.Series:
    """Dot products of L2-normalized sparse vectors, one Arrow batch at
    a time with NO per-pair Python loop: pack (pair, slot) into a single
    int64 key, intersect the two flat key arrays with ONE np.intersect1d
    call, multiply the matched values, segment-sum by pair via bincount.
    Keys are globally sorted when vec_idx is sorted per row (the
    vectorizer guarantees it); a cheap monotonicity check sorts the
    rare unsorted input."""
    n = len(ia)
    ra, sa, xa = _flatten_side(ia, va)
    rb, sb, xb = _flatten_side(ib, vb)
    if len(sa) == 0 or len(sb) == 0:
        return pd.Series(np.zeros(n, dtype="float64"))
    m = int(max(sa.max(), sb.max())) + 1
    if m > (1 << 40):  # slot ids from a huge/hashed space: densify first
        uniq = np.unique(np.concatenate([sa, sb]))
        sa = np.searchsorted(uniq, sa)
        sb = np.searchsorted(uniq, sb)
        m = len(uniq)
    ka = ra * m + sa
    kb = rb * m + sb

    def _canon(k: np.ndarray, x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        # fast path: strictly increasing keys (sorted, unique) — the
        # vectorizer's output shape. Otherwise sort and sum duplicates.
        if len(k) < 2 or (np.diff(k) > 0).all():
            return k, x
        uniq, inv = np.unique(k, return_inverse=True)
        return uniq, np.bincount(inv, weights=x, minlength=len(uniq))

    ka, xa = _canon(ka, xa)
    kb, xb = _canon(kb, xb)
    pos = np.searchsorted(kb, ka)
    pos[pos == len(kb)] = 0
    hit = kb[pos] == ka
    prod = xa[hit] * xb[pos[hit]]
    dots = np.bincount(ka[hit] // m, weights=prod, minlength=n)
    return pd.Series(dots[:n])


@F.pandas_udf(T.DoubleType())
def sparse_cosine_udf(
    ia: pd.Series, va: pd.Series, ib: pd.Series, vb: pd.Series
) -> pd.Series:  # pragma: no cover
    return sparse_cosine_batch(ia, va, ib, vb)


# ---------------------------------------------------------------------------
# packed-blob sparse vectors: Arrow serializes array<double> columns
# element-wise (measured ~45s to ship 380k pairs of 310-slot vectors);
# a binary column is one memcpy per row. Layout: n int32 slots then n
# float32 values (n = len(blob)/8).
# ---------------------------------------------------------------------------

def pack_vec(idx, val) -> bytes | None:
    if idx is None or val is None:
        return None
    si = np.asarray(idx, dtype=np.int32)
    sv = np.asarray(val, dtype=np.float32)
    return si.tobytes() + sv.tobytes()


@F.pandas_udf(T.BinaryType())
def pack_vec_udf(idx: pd.Series, val: pd.Series) -> pd.Series:  # pragma: no cover
    return pd.Series(
        [pack_vec(i, v) for i, v in zip(idx, val)], dtype="object"
    )


def _unpack_side(blobs: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Series of packed blobs -> (flat row ids, flat slots, flat values)."""
    lens = np.fromiter(
        (0 if b is None else len(b) // 8 for b in blobs),
        dtype=np.int64,
        count=len(blobs),
    )
    rows = np.repeat(np.arange(len(blobs), dtype=np.int64), lens)
    slots = np.concatenate(
        [np.frombuffer(b[: 4 * (len(b) // 8)], dtype=np.int32) for b in blobs if b]
        or [np.empty(0, dtype=np.int32)]
    ).astype(np.int64)
    vals = np.concatenate(
        [np.frombuffer(b[4 * (len(b) // 8):], dtype=np.float32) for b in blobs if b]
        or [np.empty(0, dtype=np.float32)]
    ).astype(np.float64)
    return rows, slots, vals


def sparse_cosine_blob_batch(ba: pd.Series, bb: pd.Series) -> pd.DataFrame:
    """-> DataFrame(cos_bin, cos) per pair: binary-overlap (Ochiai)
    cosine and the weighted dot product, both from packed blobs in one
    pass (same packed-key intersect as sparse_cosine_batch)."""
    n = len(ba)
    ra, sa, xa = _unpack_side(ba)
    rb, sb, xb = _unpack_side(bb)
    zeros = np.zeros(n, dtype="float64")
    if len(sa) == 0 or len(sb) == 0:
        return pd.DataFrame({"cos_bin": zeros, "cos": zeros})
    m = int(max(sa.max(), sb.max())) + 1
    ka = ra * m + sa
    kb = rb * m + sb
    # both key arrays are already globally sorted (rows ascending, slots
    # sorted within each row) — a searchsorted membership probe beats
    # intersect1d's concat+argsort and touches ~4x less fresh memory
    pos = np.searchsorted(kb, ka)
    pos[pos == len(kb)] = 0
    hit = kb[pos] == ka
    pair_of_common = ka[hit] // m
    inter = np.bincount(pair_of_common, minlength=n)[:n]
    dots = np.bincount(pair_of_common, weights=xa[hit] * xb[pos[hit]], minlength=n)[:n]
    na = np.bincount(ra, minlength=n)[:n]
    nb = np.bincount(rb, minlength=n)[:n]
    denom = np.sqrt(na.astype("float64") * nb.astype("float64"))
    cos_bin = np.divide(inter, denom, out=zeros.copy(), where=denom > 0)
    return pd.DataFrame({"cos_bin": cos_bin, "cos": dots})


_BLOB_COS_SCHEMA = T.StructType(
    [
        T.StructField("cos_bin", T.DoubleType()),
        T.StructField("cos", T.DoubleType()),
    ]
)


@F.pandas_udf(_BLOB_COS_SCHEMA)
def sparse_cosine_blob_udf(ba: pd.Series, bb: pd.Series) -> pd.DataFrame:  # pragma: no cover
    return sparse_cosine_blob_batch(ba, bb)


def sparse_dot_expr(map_a: Column, map_b: Column) -> Column:
    """Dot product of two sparse vectors carried as map<slot,double> —
    pure JVM (map_zip_with merges the key sets; missing keys are null).
    On L2-normalized vectors this IS the cosine. Replaces the Arrow UDF
    in the pair-scoring hot path: shipping both vectors of every
    candidate pair to Python costs ~10KB/pair of Arrow traffic, which
    dominated the stage."""
    prod = F.map_zip_with(
        map_a,
        map_b,
        lambda _, x, y: F.coalesce(x, F.lit(0.0)) * F.coalesce(y, F.lit(0.0)),
    )
    return F.aggregate(F.map_values(prod), F.lit(0.0), lambda acc, v: acc + v)


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
