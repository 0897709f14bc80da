"""Sink gate: table-identifier heuristic + the Iceberg writeTo branch
(exercised via a stub since the sandbox ships no Iceberg jars —
VERDICT r2 item 9 / ADVICE)."""

import pytest

from entity_resolver_spark import sinks
from entity_resolver_spark.sinks import looks_like_table, write_table


def test_looks_like_table_heuristic():
    assert looks_like_table("catalog.db.tbl")
    assert looks_like_table("db.tbl")
    assert not looks_like_table("out.parquet")      # bare data filename
    assert not looks_like_table("data.csv")
    assert not looks_like_table("results.json")
    assert not looks_like_table("/path/to/dir")
    assert not looks_like_table("s3a://bucket/key")
    assert not looks_like_table("a.b.c.d")          # too many parts
    assert not looks_like_table("weird-name.tbl")   # not an identifier
    assert not looks_like_table("plaindir")


class _StubWriter:
    def __init__(self, calls):
        self.calls = calls

    def using(self, fmt):
        self.calls.append(("using", fmt))
        return self

    def createOrReplace(self):
        self.calls.append(("createOrReplace",))

    def append(self):
        self.calls.append(("append",))


class _StubDF:
    def __init__(self):
        self.sparkSession = object()
        self.calls = []

    def writeTo(self, target):
        self.calls.append(("writeTo", target))
        return _StubWriter(self.calls)


def test_write_table_iceberg_overwrite(monkeypatch):
    monkeypatch.setattr(sinks, "_iceberg_available", lambda s: True)
    df = _StubDF()
    kind = write_table(df, "cat.db.tbl")
    assert kind == "iceberg"
    assert df.calls == [("writeTo", "cat.db.tbl"), ("using", "iceberg"), ("createOrReplace",)]


def test_write_table_iceberg_append(monkeypatch):
    monkeypatch.setattr(sinks, "_iceberg_available", lambda s: True)
    df = _StubDF()
    assert write_table(df, "cat.db.tbl", mode="append") == "iceberg"
    assert df.calls[-1] == ("append",)


def test_write_table_iceberg_bad_mode(monkeypatch):
    monkeypatch.setattr(sinks, "_iceberg_available", lambda s: True)
    with pytest.raises(ValueError, match="unsupported mode"):
        write_table(_StubDF(), "cat.db.tbl", mode="ignore")


def test_write_table_no_catalog_raises(monkeypatch):
    monkeypatch.setattr(sinks, "_iceberg_available", lambda s: False)
    with pytest.raises(RuntimeError, match="no Iceberg"):
        write_table(_StubDF(), "cat.db.tbl")


def test_write_table_parquet_path(spark, tmp_path):
    df = spark.range(3)
    target = str(tmp_path / "out.parquet")  # has '/', extension or not
    assert write_table(df, target) == "parquet"
    assert spark.read.parquet(target).count() == 3
