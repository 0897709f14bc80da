"""Table sinks: Iceberg when a catalog is configured, parquet otherwise.

The north rule targets Iceberg tables for checkpoints and outputs. This
sandbox has no Iceberg jars, so every write in the repo goes through
this gate: `writeTo(<table>).createOrReplace()` when the target looks
like a catalog table AND the session can resolve an Iceberg catalog;
a plain parquet directory write otherwise. The stage/manifest layout is
identical either way (CheckpointManager docstring).

Reference analog: persistence.py:23-144 (its canonical map was already
parquet, persistence.py:141-144).

Vendoring attempt (round 4, for the record): obtaining
iceberg-spark-runtime was attempted and is impossible in this sandbox —
`curl https://repo1.maven.org/maven2/...` fails with DNS resolution
error (exit 6), `pip download` reaches no index, and a full-filesystem
search finds no Iceberg jar anywhere on disk. The `writeTo` branch
therefore remains covered by the mocked-session tests in
tests/test_sinks.py (catalog detection, mode handling, identifier
heuristics); on any real deployment the same code path runs unmodified
with `--packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13`.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# multipart SQL identifier: 2-3 dot-separated name parts, each a plain
# identifier. A bare relative filename like 'out.parquet' must NOT match
# (its last part is a known data-file extension, and single-dot targets
# are ambiguous enough to require the extension check).
_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"
_TABLE_RE = re.compile(rf"^{_IDENT}(\.{_IDENT}){{1,2}}$")
_FILE_EXTS = {"parquet", "csv", "json", "orc", "avro", "txt", "tsv"}


def looks_like_table(target: str) -> bool:
    """True iff target reads as a catalog table identifier rather than a
    path: no '/', matches a 2-3-part identifier, and the last part is
    not a data-file extension (so 'out.parquet' writes parquet while
    'catalog.db.tbl' and 'db.tbl' go to the table branch)."""
    if "/" in target or not _TABLE_RE.match(target):
        return False
    return target.rsplit(".", 1)[1].lower() not in _FILE_EXTS


def _iceberg_available(spark) -> bool:
    """True iff an Iceberg catalog is registered in this session."""
    try:
        confs = spark.sparkContext.getConf().getAll()
    except Exception:
        return False
    return any(
        k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
        for k, v in confs
    )


def write_table(df: DataFrame, target: str, mode: str = "overwrite") -> str:
    """Write df to `target`.

    target with '/' (or a file extension) -> parquet directory;
    dotted identifier (catalog.db.table) -> Iceberg `writeTo` when the
    session has an Iceberg catalog, error otherwise (never silently
    write a parquet dir where a table was requested). mode is honored
    on BOTH branches: overwrite -> createOrReplace, append -> append,
    anything else on the table branch raises instead of silently
    replacing. Returns the sink kind actually used ('iceberg' |
    'parquet').
    """
    if looks_like_table(target):
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError(
                f"'{target}' looks like a catalog table but no Iceberg "
                "catalog is configured in this session"
            )
        writer = df.writeTo(target).using("iceberg")
        if mode == "overwrite":
            writer.createOrReplace()
        elif mode == "append":
            writer.append()
        else:
            raise ValueError(
                f"unsupported mode {mode!r} for table target {target!r} "
                "(use 'overwrite' or 'append')"
            )
        return "iceberg"
    df.write.mode(mode).parquet(target)
    return "parquet"
