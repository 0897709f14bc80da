"""Blocking channels: recall on duplicates, skew caps (FIXTURES.md F8)."""

import pyspark.sql.functions as F

from entity_resolver_spark.config import BlockingConfig
from entity_resolver_spark.operators.blocking import blocking_keys, candidate_pairs
from entity_resolver_spark.operators.collapse import collapse_turns
from entity_resolver_spark.operators.normalize import normalize_docs


def _records(spark, corpus):
    turns, _ = corpus
    return normalize_docs(collapse_turns(turns).drop("turns"))


def test_duplicates_share_a_block(spark, corpus):
    recs = _records(spark, corpus)
    _, labeled = corpus
    pairs, _ = candidate_pairs(recs, BlockingConfig())
    true_pairs = labeled.where("is_match").select(
        F.col("conv_id_a").alias("conv_a"), F.col("conv_id_b").alias("conv_b")
    )
    missed = true_pairs.join(pairs, ["conv_a", "conv_b"], "left_anti").count()
    assert missed == 0, f"{missed} labeled duplicate pairs produced no candidate"


def test_stop_key_filter_drops_degenerate_blocks(spark):
    # 50% of records share one degenerate doc (F8 skew fixture)
    rows = [(f"c{i}", "hello there hi greetings hello there") for i in range(50)]
    rows += [(f"u{i}", f"unique{i} topic{i} words{i} here{i} extra{i}") for i in range(50)]
    df = spark.createDataFrame(rows, "conv_id string, doc string")
    recs = normalize_docs(df)
    cfg = BlockingConfig(max_block_size=20, stop_key_fraction=0.2)
    pairs, metrics = candidate_pairs(recs, cfg)
    stopped = metrics.where("status = 'stop'").count()
    assert stopped > 0
    # no block contributes more pairs than its cap allows
    biggest_ok = metrics.where("status = 'ok'").agg(F.max("block_size")).first()[0]
    assert biggest_ok is None or biggest_ok <= 20
    # degenerate half must not produce all-pairs quadratic blowup (50*49/2)
    assert pairs.count() < 1225


def test_block_metrics_statuses(spark, corpus):
    recs = _records(spark, corpus)
    _, metrics = candidate_pairs(recs, BlockingConfig())
    statuses = {r["status"] for r in metrics.select("status").distinct().collect()}
    assert statuses <= {"ok", "capped", "stop"}


def test_keys_are_deterministic(spark, corpus):
    recs = _records(spark, corpus)
    k1 = blocking_keys(recs, BlockingConfig())
    k2 = blocking_keys(recs, BlockingConfig())
    assert k1.exceptAll(k2).count() == 0
