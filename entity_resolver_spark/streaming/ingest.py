"""Streaming ingestion of new transcript turns (SURVEY §2.11).

The reference is strictly batch (resolver.py fit/transform); the north
rule keeps the pipeline batch too. This module covers the ingestion
seam a production deployment needs: new turns arrive continuously, are
collapsed incrementally per conversation with a watermark, and land in
the staging table the batch pipeline reads (the reference's
`transform` path then scores new records against existing canonical
profiles — see pipeline notes).

Spark-first: readStream -> withWatermark -> groupBy(conv_id) windowed
aggregation -> append sink. For tests, the memory sink +
processAllAvailable() drives a bounded parquet directory through the
same code path synchronously.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURN_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)


def read_turn_stream(spark: SparkSession, path: str, max_files_per_trigger: int = 4) -> DataFrame:
    """File-source stream of turn rows (parquet drop-zone). On a real
    deployment this is a Kafka source with the same schema."""
    return (
        spark.readStream.schema(TURN_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def windowed_conversation_updates(
    turns: DataFrame, watermark: str = "10 minutes", window: str = "5 minutes"
) -> DataFrame:
    """Per (conversation, event-time window) incremental rollup: turn
    count, ordered text fragment, time bounds. Late turns beyond the
    watermark are dropped deterministically."""
    return (
        turns.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("conv_id"))
        .agg(
            F.count("*").alias("n_turns"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda t: t["text"],
                ),
                " ",
            ).alias("fragment"),
            F.min("ts").alias("ts_min"),
            F.max("ts").alias("ts_max"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "conv_id", "n_turns", "fragment", "ts_min", "ts_max",
        )
    )


def run_to_memory_sink(
    spark: SparkSession, src_path: str, query_name: str = "turn_updates"
) -> DataFrame:
    """Drive the stream synchronously to completion (test/drain mode) and
    return the materialized result."""
    stream = read_turn_stream(spark, src_path)
    updates = windowed_conversation_updates(stream)
    q = (
        updates.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
