"""Multimodal plumbing: schema, batch shape, determinism of the
feature UDF; decode stub is explicit."""

import pytest

from entity_resolver_spark.operators.multimodal import (
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_schema_and_rowcount(spark):
    m = synth_media(spark, 24)
    ft = extract_features(m, dim=16)
    rows = ft.collect()
    assert len(rows) == 24
    assert all(len(r["features"]) == 16 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)


def test_features_deterministic(spark):
    m = synth_media(spark, 12)
    a = extract_features(m, dim=8).orderBy("media_id").collect()
    b = extract_features(m, dim=8).orderBy("media_id").collect()
    assert [r["features"] for r in a] == [r["features"] for r in b]


def test_real_decode_is_explicit_stub(spark):
    m = synth_media(spark, 2)
    with pytest.raises(NotImplementedError):
        extract_features(m, fake_decode=False)


def test_frame_plan_only_videos(spark):
    m = synth_media(spark, 30)
    plan = frame_sample_plan(m, every_ms=5000)
    kinds = m.select("media_id", "kind").collect()
    vids = {r["media_id"] for r in kinds if r["kind"] == "video"}
    got = {r["media_id"] for r in plan.collect()}
    assert got == vids
