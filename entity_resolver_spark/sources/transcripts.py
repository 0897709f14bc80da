"""Derive a transcripts table (input_hint shape) from the driver's
events table, deterministically — plus duplicate-conversation
injection for end-to-end pipeline runs on testdata.

The derivation is pure SQL (same text in Spark and DuckDB) so
oracle-checked queries can share it. Each user's event stream becomes
one conversation: turn order = (ts, event_id); text carries the event
type, its props payload, and a quantized value token so conversations
are lexically distinctive (the real transcript corpus property the
blocking channels rely on).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

# shared SQL text (Spark SQL and DuckDB both accept this) — keep in
# lockstep with transcripts_from_events below
TRANSCRIPTS_SQL = """
SELECT concat('u', CAST(user_id AS STRING))              AS conv_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT)
                                                          AS turn_idx,
       CASE WHEN event_type IN ('signup','login','purchase') THEN 'user'
            WHEN event_type = 'error' THEN 'tool'
            ELSE 'assistant' END                          AS role,
       concat(event_type, ' ', props, ' v', CAST(CAST(FLOOR(value * 10) AS INT) AS STRING))
                                                          AS text,
       event_type                                         AS tool,
       ts                                                 AS ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.createOrReplaceTempView("events")
    # Spark's CAST(string) on double differs from DuckDB; SQL above uses
    # int casts only, which match
    return spark.sql(TRANSCRIPTS_SQL.replace("AS STRING", "AS STRING"))


def inject_duplicates(
    turns: DataFrame, fraction: float = 0.3, seed: int = 42, variants: int = 1
) -> DataFrame:
    """Append perturbed copies of a deterministic subset of
    conversations: conv_id gets a '_d<v>' suffix; ~15% of each copy's
    turns get a trailing ' ok' token and digits 9->8 swapped in the
    props payload (mild typo analog). Selection and perturbation are
    hash-based, so re-runs are identical. `variants` > 1 multiplies the
    corpus deterministically (scaling benchmarks)."""
    pick = F.pmod(F.xxhash64("conv_id", F.lit(seed)), F.lit(1000)) < int(fraction * 1000)
    out = turns
    for v in range(1, variants + 1):
        perturb_turn = (
            F.pmod(F.xxhash64("conv_id", "turn_idx", F.lit(seed + v)), F.lit(100)) < 15
        )
        dup = (
            turns.where(pick)
            .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit(f"_d{v}")))
            .withColumn(
                "text",
                F.when(
                    perturb_turn,
                    F.concat(F.regexp_replace("text", "9", "8"), F.lit(" ok")),
                ).otherwise(F.col("text")),
            )
        )
        out = out.unionByName(dup)
    return out
