"""Local mimic of the driver's correctness gate: run every
__spark_entry__ query at a given sf and compare with its DuckDB oracle
(row count + column names + order-insensitive value comparison)."""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry  # noqa: E402
from entity_resolver_spark.session import get_spark  # noqa: E402


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main(sf_dir: str = "/root/testdata/sf0.01", only: list[str] | None = None) -> int:
    spark = get_spark(cores=8)
    con = duckdb.connect()
    for t in entry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(spdf)} rows")
            if len(spdf) == 0 and name != "turn_violations":
                print(f"  WARNING: 0 rows")
            continue
        try:
            opdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        a, b = normalize(spdf), normalize(opdf)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
            failures += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} vs {len(b)}")
            failures += 1
            continue
        # The driver's value-hash is dtype-sensitive (int64 vs float64 differ),
        # so a dtype mismatch is a FAILURE here, not something to paper over.
        # Spark int32 vs DuckDB int64 is the one benign width difference we
        # allow (both hash as integers after the driver's normalization).
        dtype_fail = False
        for c in a.columns:
            da, db = str(a[c].dtype), str(b[c].dtype)
            if da == db:
                continue
            if da.startswith("int") and db.startswith("int"):
                a[c] = a[c].astype("int64")
                b[c] = b[c].astype("int64")
                continue
            print(f"FAIL {name}: dtype mismatch col={c} spark={da} oracle={db}")
            dtype_fail = True
        if dtype_fail:
            failures += 1
            continue
        a = a.sort_values(by=list(a.columns), ignore_index=True)
        b = b.sort_values(by=list(b.columns), ignore_index=True)
        neq = (a != b) & ~(a.isna() & b.isna())
        if neq.any().any():
            bad = neq.any(axis=1)
            print(f"FAIL {name}: {int(bad.sum())}/{len(a)} mismatched rows, e.g.")
            print("  spark:", a[bad].head(3).to_dict("records"))
            print("  duck :", b[bad].head(3).to_dict("records"))
            failures += 1
            continue
        print(f"OK   {name}: {len(a)} rows match")
    print(f"\n{failures} failures")
    return failures


if __name__ == "__main__":
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(min(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01", only), 1))
