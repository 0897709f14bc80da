"""Checkpoint/resume: second run resumes every stage; stale
fingerprints invalidate (north rule resumability)."""

import tempfile

from entity_resolver_spark import EntityResolverPipeline, ResolverConfig


def test_resume_from_checkpoints(spark, corpus):
    turns, _ = corpus
    small = turns.where("conv_id < 'conv_00010'")
    with tempfile.TemporaryDirectory() as ck:
        cfg = ResolverConfig()
        cfg.output.checkpoint_dir = ck
        p1 = EntityResolverPipeline(cfg)
        r1 = p1.resolve(spark, small)
        n1 = r1.count()
        assert not any(m["resumed"] for m in p1.metrics)

        p2 = EntityResolverPipeline(cfg)
        r2 = p2.resolve(spark, small)
        assert all(m["resumed"] for m in p2.metrics)
        assert r2.count() == n1
        # resumed output identical
        assert r1.select("conv_id", "cluster").exceptAll(
            r2.select("conv_id", "cluster")
        ).count() == 0


def test_config_change_invalidates_checkpoints(spark, corpus):
    turns, _ = corpus
    small = turns.where("conv_id < 'conv_00005'")
    with tempfile.TemporaryDirectory() as ck:
        cfg = ResolverConfig()
        cfg.output.checkpoint_dir = ck
        p1 = EntityResolverPipeline(cfg)
        p1.resolve(spark, small)

        cfg2 = ResolverConfig()
        cfg2.output.checkpoint_dir = ck
        cfg2.scoring.edge_threshold = 0.9  # different fingerprint
        p2 = EntityResolverPipeline(cfg2)
        p2.resolve(spark, small)
        assert not any(m["resumed"] for m in p2.metrics)


def test_data_change_invalidates_checkpoints(spark, corpus):
    """Same config, same checkpoint_dir, same SCHEMA but different rows
    must not resume stale stages (the run fingerprint folds in a data
    checksum)."""
    turns, _ = corpus
    small = turns.where("conv_id < 'conv_00005'")
    other = turns.where("conv_id >= 'conv_00005' and conv_id < 'conv_00010'")
    with tempfile.TemporaryDirectory() as ck:
        cfg = ResolverConfig()
        cfg.output.checkpoint_dir = ck
        p1 = EntityResolverPipeline(cfg)
        r1 = p1.resolve(spark, small)
        ids1 = {r["conv_id"] for r in r1.select("conv_id").collect()}

        p2 = EntityResolverPipeline(cfg)
        r2 = p2.resolve(spark, other)
        assert not any(m["resumed"] for m in p2.metrics)
        ids2 = {r["conv_id"] for r in r2.select("conv_id").collect()}
        assert ids1.isdisjoint(ids2)
