"""Multimodal plumbing tests: the decode is a deterministic fake, but the
Spark-side schema / Arrow batching / partitioning must be real."""

from __future__ import annotations

import pytest

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.functions import multimodal as mm
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def payloads(spark):
    return mm.with_payload(load_table(spark, SF_DIR, "documents"))


def test_payload_schema(payloads):
    dtypes = dict(payloads.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["media_meta"].startswith("struct<media_type:string")


def test_extract_features_shape_and_determinism(payloads):
    feats = mm.extract_features(payloads).collect()
    assert len(feats) == 500
    row = next(r for r in feats if r.doc_id == 0)
    assert len(row.features) == mm.FEATURE_DIM
    assert row.n_bytes > 0 and len(row.sha_hex) == 64
    # deterministic across a second run
    again = {r.doc_id: r.features for r in mm.extract_features(payloads).collect()}
    assert again[0] == row.features
    # histogram features sum to ~1 (normalized by byte count)
    assert abs(sum(row.features) - 1.0) < 1e-6


def test_strict_decoder_raises(payloads):
    import pyspark.errors

    with pytest.raises(Exception) as ei:
        mm.extract_features(payloads, decoder=mm.strict_decode).collect()
    assert "NotImplementedError" in str(ei.value) or "decode" in str(ei.value)


def test_frame_sample_chunks(payloads):
    frames = mm.frame_sample(payloads, every_n_bytes=64)
    pdf = frames.filter("doc_id = 1").orderBy("frame_idx").collect()
    total = sum(len(r.frame_payload) for r in pdf)
    orig = payloads.filter("doc_id = 1").collect()[0].payload
    assert total == len(orig)
    assert b"".join(r.frame_payload for r in pdf) == bytes(orig)
    assert all(len(r.frame_payload) <= 64 for r in pdf)


def test_resize_images_shapes_and_determinism(payloads):
    from duck_delta_share_spark.functions import multimodal as mm

    out = mm.resize_images(payloads, target_w=8, target_h=4).collect()
    assert len(out) == payloads.count()
    for r in out:
        assert len(r.payload) == 32
        assert r.media_meta.width == 8 and r.media_meta.height == 4
    again = {r.doc_id: bytes(r.payload) for r in mm.resize_images(payloads, 8, 4).collect()}
    assert {r.doc_id: bytes(r.payload) for r in out} == again


def test_strict_resize_raises(payloads):
    import pytest as _pytest

    from duck_delta_share_spark.functions import multimodal as mm

    with _pytest.raises(Exception, match="NotImplementedError|imaging"):
        mm.resize_images(payloads, 4, 4, resizer=mm.strict_resize).collect()
