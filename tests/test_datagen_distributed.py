"""corpus_distributed: pure-codegen corpus generation at arbitrary scale.

Unlike `generate_corpus` (driver-side Python rows, fine for labeled test
corpora), this generator runs entirely on executors, so the linear-work
scaling ladder (families grow, family size doesn't — the real shape of a
corpus growing toward 10^12 turns) can be synthesized at any size.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from entity_resolver_spark.datagen import corpus_distributed, pairwise_prf


@pytest.fixture(scope="module")
def corpus_d(spark):
    return corpus_distributed(spark, n_families=80, members=4).cache()


def test_schema_matches_input_hint(corpus_d):
    assert corpus_d.schema.simpleString() == (
        "struct<conv_id:string,turn_idx:int,role:string,text:string,"
        "tool:string,ts:timestamp>"
    )


def test_shape_and_anchor(corpus_d):
    assert corpus_d.select("conv_id").distinct().count() == 80 * 4
    # every member of a family opens with the same rare anchor token
    t0 = corpus_d.where("turn_idx = 0").select(
        F.split("conv_id", "_").getItem(0).alias("fam"),
        F.split("text", " ").getItem(0).alias("anchor"),
    )
    assert t0.groupBy("fam").agg(F.countDistinct("anchor").alias("n")).where(
        "n != 1"
    ).count() == 0
    assert t0.select("anchor").distinct().count() == 80


def test_deterministic_across_partitionings(spark, corpus_d):
    digest = "bit_xor(xxhash64(conv_id, turn_idx, role, text, tool, ts))"
    a = corpus_d.agg(F.expr(digest).alias("h")).collect()[0]["h"]
    b = (
        corpus_distributed(spark, 80, 4, partitions=7)
        .agg(F.expr(digest).alias("h"))
        .collect()[0]["h"]
    )
    assert a == b


def test_perturbations_are_exclusive(corpus_d):
    # a truncated member (fewer turns than member 0) must carry NO typos:
    # its surviving turns are byte-identical to the base member's
    nt = corpus_d.groupBy("conv_id").agg(
        F.count("*").alias("nt"),
        F.split(F.first("conv_id"), "_").getItem(0).alias("fam"),
    )
    base = nt.where(F.col("conv_id").endswith("_m0")).select(
        "fam", F.col("nt").alias("nt0")
    )
    trunc = (
        nt.join(base, "fam")
        .where((F.col("nt") < F.col("nt0")))
        .select("conv_id", "fam")
    )
    t = corpus_d.select("conv_id", "turn_idx", "text")
    base_t = corpus_d.where(F.col("conv_id").endswith("_m0")).select(
        F.split("conv_id", "_").getItem(0).alias("bfam"),
        F.col("turn_idx").alias("ti"),
        F.col("text").alias("base_text"),
    )
    diff = (
        t.join(trunc, "conv_id")
        .join(
            base_t,
            (F.col("fam") == F.col("bfam")) & (F.col("turn_idx") == F.col("ti")),
            "inner",
        )
        .where(F.col("text") != F.col("base_text"))
    )
    assert trunc.count() > 0, "corpus produced no truncated members"
    assert diff.count() == 0


def test_resolves_at_f1_1(spark):
    from entity_resolver_spark import EntityResolverPipeline

    turns = corpus_distributed(spark, n_families=80, members=4).localCheckpoint(
        eager=True
    )
    res = EntityResolverPipeline().resolve(spark, turns)
    prf = pairwise_prf(res)
    assert prf["precision"] == 1.0 and prf["recall"] == 1.0, prf


def test_viral_family_shape_and_determinism(spark):
    """viral_families/viral_members: the first family gets the viral
    member count, the rest the normal one; generation stays
    byte-deterministic across partitionings (the viral path adds a
    repartition that must not change values)."""
    v = corpus_distributed(
        spark, n_families=10, members=3, viral_families=1, viral_members=25
    ).cache()
    sizes = {
        r["fam"]: r["n"]
        for r in v.select(F.split("conv_id", "_").getItem(0).alias("fam"), "conv_id")
        .distinct()
        .groupBy("fam")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert sizes["f0000000"] == 25
    assert all(n == 3 for fam, n in sizes.items() if fam != "f0000000")

    digest = "bit_xor(xxhash64(conv_id, turn_idx, role, text, tool, ts))"
    a = v.agg(F.expr(digest).alias("h")).collect()[0]["h"]
    b = (
        corpus_distributed(
            spark, 10, 3, partitions=5, viral_families=1, viral_members=25
        )
        .agg(F.expr(digest).alias("h"))
        .collect()[0]["h"]
    )
    assert a == b
    # non-viral families are byte-identical to a run WITHOUT the viral
    # option (the viral member explode must not disturb their hashes)
    plain = corpus_distributed(spark, 10, 3).where("conv_id not like 'f0000000%'")
    pa = plain.agg(F.expr(digest).alias("h")).collect()[0]["h"]
    pb = v.where("conv_id not like 'f0000000%'").agg(F.expr(digest).alias("h")).collect()[0]["h"]
    assert pa == pb
    v.unpersist()
