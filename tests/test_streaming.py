"""Streaming ingestion: file-source stream drained synchronously
through the windowed rollup (append mode past the watermark)."""

import datetime as dt
import tempfile

import pyspark.sql.functions as F

from entity_resolver_spark.streaming.ingest import TURN_SCHEMA, run_to_memory_sink


def test_stream_rollup(spark):
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        ("c1", 0, "user", "hello", "", t0),
        ("c1", 1, "assistant", "hi there", "", t0 + dt.timedelta(seconds=30)),
        ("c2", 0, "user", "solo turn", "", t0 + dt.timedelta(minutes=1)),
        # a much later turn advances the watermark so earlier windows close
        ("c3", 0, "user", "late anchor", "", t0 + dt.timedelta(hours=2)),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, TURN_SCHEMA).coalesce(1).write.parquet(d, mode="append")
        out = run_to_memory_sink(spark, d, query_name="t_stream_rollup")
        got = {r["conv_id"]: r for r in out.collect() if r["conv_id"] in ("c1", "c2")}
    assert got["c1"]["n_turns"] == 2
    assert got["c1"]["fragment"] == "hello hi there"  # turn-ordered
    assert got["c2"]["fragment"] == "solo turn"
