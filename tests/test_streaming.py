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


def test_merge_turn_state_pure():
    from entity_resolver_spark.streaming.stateful import merge_turn_state

    # dedup: first occurrence per turn_idx wins; output turn-ordered
    idxs, texts = merge_turn_state([0, 2], ["a", "c"], [1, 2, 3], ["b", "C2", "d"])
    assert idxs == [0, 1, 2, 3]
    assert texts == ["a", "b", "c", "d"]
    # empty state
    assert merge_turn_state([], [], [1, 0], ["y", "x"]) == ([0, 1], ["x", "y"])


def test_stateful_collapse_stream(spark):
    import os

    from entity_resolver_spark.streaming.ingest import TURN_SCHEMA, read_turn_stream
    from entity_resolver_spark.streaming.stateful import stateful_conversation_collapse

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    batch1 = [
        ("c1", 0, "user", "hello", "", t0),
        ("c1", 1, "assistant", "hi there", "", t0 + dt.timedelta(seconds=30)),
        ("c1", 0, "user", "hello DUP", "", t0),  # duplicate turn_idx: first wins
        ("c2", 0, "user", "solo", "", t0),
    ]
    # far-future anchor: advances the event-time watermark 2h, so the
    # c1/c2 idle timeouts (last turn + 10 min) fire deterministically
    batch2 = [("c3", 0, "user", "late anchor", "", t0 + dt.timedelta(hours=2))]
    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        spark.createDataFrame(batch1, TURN_SCHEMA).coalesce(1).write.parquet(
            src, mode="append"
        )
        stream = read_turn_stream(spark, src, max_files_per_trigger=1)
        out = stateful_conversation_collapse(
            stream, idle_gap="10 minutes", watermark="10 minutes"
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_stateful_collapse")
            .option("checkpointLocation", os.path.join(d, "chk"))
            .start()
        )
        try:
            q.processAllAvailable()
            spark.createDataFrame(batch2, TURN_SCHEMA).coalesce(1).write.parquet(
                src, mode="append"
            )
            q.processAllAvailable()
        finally:
            q.stop()
        rows = spark.sql("SELECT * FROM t_stateful_collapse").collect()
    snaps = {(r["conv_id"], r["n_turns"], r["doc"]) for r in rows if not r["is_final"]}
    finals = {(r["conv_id"], r["n_turns"], r["doc"]) for r in rows if r["is_final"]}
    # snapshots reflect merged state with turn-idx dedup and ordering
    assert ("c1", 2, "hello hi there") in snaps
    assert ("c2", 1, "solo") in snaps
    # watermark passed last+gap for c1/c2 -> final rows; c3 still open
    assert ("c1", 2, "hello hi there") in finals
    assert ("c2", 1, "solo") in finals
    assert not any(c == "c3" for c, _, _ in finals)
