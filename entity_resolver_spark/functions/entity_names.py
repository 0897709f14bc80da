"""Entity-name normalization rules (SURVEY P3/P4/P5).

Re-expresses the reference's 10-step name-normalization regex pipeline
(/root/reference/entity_resolver/normalizer.py:100-210 pattern
compilation, 255-361 application order) as ONE pattern table that
drives three lockstep implementations:

  * a Spark Column expression chain (pure JVM regexp_replace /
    regexp_extract — Java regex has \\b and $1 backrefs, so none of the
    reference's RE2 workarounds are needed, SURVEY P3 note);
  * a DuckDB SQL expression (for the driver's oracle cross-check);
  * a plain-Python twin (unit tests).

Step order (reference normalizer.py:255-361, on already lowercased
NFKC text): word-number expansion (triple a -> aaa) -> configured word
replacements -> business-qualifier extraction (dba/fka/aka/trading as;
keep the extracted name, else the original, P4) -> separator
standardization -> parenthetical/bracket removal -> OCR fixes
(l0 -> lo) -> iterative suffix removal x3 ("inc usa llc", P5) ->
possessive strip -> special chars -> whitespace collapse.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# default corporate suffixes (reference example_config.yaml:49-70 set;
# longest first so compound suffixes strip greedily, normalizer.py:199)
DEFAULT_SUFFIXES = [
    "incorporated", "corporation", "company", "limited", "holdings",
    "group", "corp", "inc", "llc", "llp", "ltd", "plc", "co", "lp",
]


_QUALIFIER_PATTERN = (
    r"(?:^|.*?[^a-z0-9])"
    r"(?:d[/.\-\s]*b[/.\-\s]*a|f[/.\-\s]*k[/.\-\s]*a|a[/.\-\s]*k[/.\-\s]*a"
    r"|formerly|now\s+known\s+as|trading\s+as|doing\s+business\s+as)"
    r"[\s:]+(.+?)$"
)

# (pattern, replacement-with-backrefs) applied in order; $N spelled as
# \N here and translated per engine
_PRE_QUALIFIER: list[tuple[str, str]] = [
    (r"(^|[^a-z0-9])triple\s+([a-z])($|[^a-z0-9])", r"\1\2\2\2\3"),
    (r"(^|[^a-z0-9])double\s+([a-z])($|[^a-z0-9])", r"\1\2\2\3"),
]

_POST_QUALIFIER: list[tuple[str, str]] = [
    (r"&+", " and "),
    (r"\++", " and "),
    (r"[/|·•]", " "),
    (r"[–—-]+", " "),
    (r"\([^)]*\)", " "),
    (r"\[[^\]]*\]", " "),
    (r"([a-z])0([a-z])", r"\1o\2"),
    (r"([a-z])1([a-z])", r"\1l\2"),
]

_FINAL: list[tuple[str, str]] = [
    (r"'s($|[^a-z0-9])", r" \1"),
    (r"[^a-z0-9 ]", " "),
    (r"\s+", " "),
]

SUFFIX_PASSES = 3  # reference normalizer.py:320-337


def _suffix_pattern(suffixes: list[str]) -> str:
    alts = "|".join(re.escape(s) for s in sorted(suffixes, key=len, reverse=True))
    return r"(^|[^a-z0-9])(?:" + alts + r")\s*$"


def _steps(suffixes: list[str]) -> list[tuple[str, str]]:
    out = list(_POST_QUALIFIER)
    out += [(_suffix_pattern(suffixes), r"\1")] * SUFFIX_PASSES
    out += _FINAL
    return out


# ---------------------------------------------------------------------------
# Spark expression
# ---------------------------------------------------------------------------

def normalize_entity_expr(col: Column, suffixes: list[str] | None = None) -> Column:
    """Full P3-P5 chain as a JVM expression tree (input: lowercased)."""
    suffixes = suffixes if suffixes is not None else DEFAULT_SUFFIXES
    x = col
    for pat, repl in _PRE_QUALIFIER:
        x = F.regexp_replace(x, pat, repl.replace("\\", "$"))
    extracted = F.regexp_extract(x, _QUALIFIER_PATTERN, 1)
    x = F.coalesce(F.nullif(extracted, F.lit("")), x)
    for pat, repl in _steps(suffixes):
        x = F.regexp_replace(x, pat, repl.replace("\\", "$"))
    return F.trim(x)


# ---------------------------------------------------------------------------
# DuckDB oracle SQL (same table, same order)
# ---------------------------------------------------------------------------

def normalize_entity_sql(col_sql: str, suffixes: list[str] | None = None) -> str:
    """The identical chain as a DuckDB SQL scalar expression."""
    suffixes = suffixes if suffixes is not None else DEFAULT_SUFFIXES

    def esc(s: str) -> str:
        return s.replace("'", "''")

    x = col_sql
    for pat, repl in _PRE_QUALIFIER:
        x = f"regexp_replace({x}, '{esc(pat)}', '{esc(repl)}', 'g')"
    ex = f"regexp_extract({x}, '{esc(_QUALIFIER_PATTERN)}', 1)"
    x = f"coalesce(nullif({ex}, ''), {x})"
    for pat, repl in _steps(suffixes):
        x = f"regexp_replace({x}, '{esc(pat)}', '{esc(repl)}', 'g')"
    return f"trim({x})"


# ---------------------------------------------------------------------------
# Python twin (tests)
# ---------------------------------------------------------------------------

def normalize_entity_py(s: str, suffixes: list[str] | None = None) -> str:
    suffixes = suffixes if suffixes is not None else DEFAULT_SUFFIXES
    x = s
    for pat, repl in _PRE_QUALIFIER:
        x = re.sub(pat, repl, x)
    m = re.match(_QUALIFIER_PATTERN, x)
    if m and m.group(1):
        x = m.group(1)
    for pat, repl in _steps(suffixes):
        x = re.sub(pat, repl, x)
    return x.strip()
