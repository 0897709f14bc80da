"""Table sinks: Iceberg when a catalog is configured, parquet otherwise.

The north rule targets Iceberg tables for checkpoints and outputs. This
sandbox has no Iceberg jars, so every write in the repo goes through
this gate: `writeTo(<table>).createOrReplace()` when the target looks
like a catalog table AND the session can resolve an Iceberg catalog;
a plain parquet directory write otherwise. The stage/manifest layout is
identical either way (CheckpointManager docstring).

Reference analog: persistence.py:23-144 (its canonical map was already
parquet, persistence.py:141-144).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


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

    target with '/' (or file scheme) -> parquet directory;
    dotted identifier (catalog.db.table) -> Iceberg `writeTo` when the
    session has an Iceberg catalog, error otherwise (never silently
    write a parquet dir where a table was requested).
    Returns the sink kind actually used ('iceberg' | 'parquet').
    """
    looks_like_table = "/" not in target and "." in target
    if looks_like_table:
        if not _iceberg_available(df.sparkSession):
            raise RuntimeError(
                f"'{target}' looks like a catalog table but no Iceberg "
                "catalog is configured in this session"
            )
        df.writeTo(target).using("iceberg").createOrReplace()
        return "iceberg"
    df.write.mode(mode).parquet(target)
    return "parquet"
