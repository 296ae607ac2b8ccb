"""Multimodal plumbing tests — binary schema, Arrow batch shapes, decode
stub behavior, determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deep_reason_spark.operators.multimodal import (
    decode_payload,
    extract_binary_meta,
    featurize_media,
    frame_sample,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 60).localCheckpoint()


def test_media_schema(media):
    assert dict(media.dtypes)["payload"] == "binary"
    assert media.count() == 60
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_meta_extraction_is_jvm_side(spark, media):
    meta = extract_binary_meta(media)
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python for the metadata pass
    rows = meta.collect()
    assert all(r.n_bytes >= 128 for r in rows)
    assert all(len(r.magic) == 8 for r in rows)  # 4 bytes → 8 hex chars
    img = [r for r in rows if r.kind == "image"]
    assert img and all(r.width is not None for r in img)


def test_decode_is_stubbed(media):
    [row] = media.limit(1).collect()
    with pytest.raises(NotImplementedError):
        decode_payload(row.kind, bytes(row.payload))


def test_featurize_shape_and_determinism(spark, media):
    f1 = featurize_media(media, dim=16)
    rows = {r.media_id: r for r in f1.collect()}
    assert len(rows) == 60
    for r in rows.values():
        assert len(r.features) == 16
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram
    rows2 = {r.media_id: r for r in featurize_media(media, dim=16).collect()}
    assert all(rows[k].features == rows2[k].features for k in rows)


def test_frame_sampling_batch_shape(spark, media):
    frames = frame_sample(media, frame_bytes=32, every_n=2)
    got = frames.collect()
    assert len(got) > 60  # 1 input row → many frames
    by_media = {}
    for r in got:
        by_media.setdefault(r.media_id, []).append(r.frame_id)
        assert len(bytes(r.frame)) == 32
    for fids in by_media.values():
        assert fids == sorted(fids) or sorted(fids) == fids
        assert all(f % 2 == 0 for f in fids)  # every_n=2 keeps even frames
