"""P3/P4/P5 entity-name normalization: the Spark expression, the
DuckDB oracle SQL, and the Python twin must agree exactly (the driver
hash-compares values, so engine-level regex differences would be
caught there — catch them here first)."""

from __future__ import annotations

import duckdb
import pyspark.sql.functions as F
import pytest

from entity_resolver_spark.functions.entity_names import (
    normalize_entity_expr,
    normalize_entity_py,
    normalize_entity_sql,
)

CASES = [
    "acme widgets inc",
    "acme widgets incorporated usa llc",
    "smith & sons co",
    "big corp d/b/a triple a parts",
    "jones holdings (delaware) llc",
    "o'brien's plumbing ltd",
    "visi0n lab0ratories inc",
    "mega-industries / global division",
    "alpha beta formerly gamma delta llc",
    "double u ranch co",
    "plain name",
    "ta xes and more",   # 'ta' qualifier must not fire inside words
    "x",
    "",
]

EXPECTED = {
    "acme widgets inc": "acme widgets",
    "big corp d/b/a triple a parts": "aaa parts",
    "jones holdings (delaware) llc": "jones",
    "visi0n lab0ratories inc": "vision laboratories",
    "alpha beta formerly gamma delta llc": "gamma delta",
    "double u ranch co": "uu ranch",
}


def test_python_twin_expected_values():
    for raw, want in EXPECTED.items():
        assert normalize_entity_py(raw) == want, raw


def test_duckdb_matches_python():
    con = duckdb.connect()
    sql = normalize_entity_sql("s")
    for c in CASES:
        got = con.execute(f"select {sql} from (select ? as s)", [c]).fetchone()[0]
        assert got == normalize_entity_py(c), c


@pytest.mark.usefixtures("spark")
def test_spark_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    rows = df.select(
        "s", normalize_entity_expr(F.col("s")).alias("n")
    ).collect()
    for r in rows:
        assert r["n"] == normalize_entity_py(r["s"]), r["s"]
