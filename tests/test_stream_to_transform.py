"""Integration: the streaming seam feeds the incremental batch path.

Production shape (README/checkpoint docs): the stateful streaming
collapse decides WHEN a conversation is complete (event-time idle
timeout); completed conversations' turns then flow through
SparkEntityResolver.transform for incremental assignment against the
fitted state — no refit. This test drives that whole seam end-to-end:
fit on a base corpus -> stream a near-duplicate conversation plus a
watermark anchor -> collect the conversations the STREAM finalized ->
transform exactly those -> assert the duplicate joined its family's
existing cluster.
"""

import datetime as dt
import os
import tempfile

import pyspark.sql.functions as F

from entity_resolver_spark import SparkEntityResolver
from entity_resolver_spark.datagen import corpus_spark
from entity_resolver_spark.streaming.ingest import TURN_SCHEMA, read_turn_stream
from entity_resolver_spark.streaming.stateful import stateful_conversation_collapse


def test_stream_finalized_conversations_flow_into_transform(spark):
    tdf, _ = corpus_spark(spark, n_base=20)
    res = SparkEntityResolver().fit(spark, tdf)

    # a near-duplicate of an existing conversation: same turns, one
    # conv appended marker token (same perturbation family datagen uses)
    src_conv = tdf.where("conv_id = 'conv_00000_0'")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    new_turns = src_conv.select(
        F.lit("stream-dup-0").alias("conv_id"),
        F.col("turn_idx").cast("int").alias("turn_idx"),
        "role",
        F.concat("text", F.lit(" xq")).alias("text"),
        "tool",
        F.lit(t0).cast("timestamp").alias("ts"),
    )
    anchor = spark.createDataFrame(
        [("anchor", 0, "user", "late anchor", "", t0 + dt.timedelta(hours=2))],
        TURN_SCHEMA,
    )

    with tempfile.TemporaryDirectory() as d:
        src = os.path.join(d, "src")
        new_turns.select(*[f.name for f in TURN_SCHEMA]).coalesce(1).write.parquet(
            src, mode="append"
        )
        stream = read_turn_stream(spark, src, max_files_per_trigger=1)
        out = stateful_conversation_collapse(
            stream, idle_gap="10 minutes", watermark="10 minutes"
        )
        q = (
            out.writeStream.outputMode("append")
            .format("memory")
            .queryName("t_seam")
            .option("checkpointLocation", os.path.join(d, "chk"))
            .start()
        )
        try:
            q.processAllAvailable()
            anchor.coalesce(1).write.parquet(src, mode="append")
            q.processAllAvailable()
        finally:
            q.stop()
        finals = [
            r["conv_id"]
            for r in spark.sql(
                "SELECT conv_id FROM t_seam WHERE is_final"
            ).collect()
        ]
    # the stream declared the duplicate complete (anchor is still open)
    assert finals == ["stream-dup-0"]

    ready = new_turns.where(F.col("conv_id").isin(finals))
    assigned = res.transform(spark, ready)
    got = assigned.where("conv_id = 'stream-dup-0'").first()
    base_cluster = (
        res.resolved_.where("conv_id = 'conv_00000_0'").select("cluster").first()["cluster"]
    )
    # incremental assignment reunited the streamed duplicate with its
    # family's existing cluster
    assert got["cluster"] == base_cluster
