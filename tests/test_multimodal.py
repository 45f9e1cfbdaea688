"""Multimodal plumbing: real byte-level paths, stubbed decoders,
deterministic fake features (task brief: stub the decode, make the
Spark-side schema/partitioning/UDF-signature/batch-shape real)."""

from __future__ import annotations

import pytest

from spinneret_spark.operators.multimodal import (
    decode_media,
    deterministic_fake_features,
    extract_media_meta,
    frame_sample_stub,
    FEATURE_DIM,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        ("img1", "image", bytearray(b"\x89PNG" + b"x" * 5000)),
        ("img2", "image", bytearray(b"\x89PNG" + b"y" * 9000)),
        ("vid1", "video", bytearray(b"\x00" * 20000)),
        ("bad1", "image", None),
    ]
    return spark.createDataFrame(
        rows, "media_id string, kind string, blob binary"
    )


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image")


def test_media_meta_byte_level(spark, media):
    out = extract_media_meta(media).toPandas().set_index("media_id")
    assert out.loc["img1", "n_bytes"] == 5004
    assert out.loc["vid1", "n_bytes"] == 20000
    assert out.loc["bad1", "n_bytes"] == 0
    assert out.loc["img1", "checksum"] != out.loc["img2", "checksum"]
    # pixel-level fields stay null until a real decoder lands
    assert out["width"].isna().all()


def test_fake_features_deterministic_unit_norm(spark, media):
    a = deterministic_fake_features(media).toPandas().set_index("media_id")
    b = deterministic_fake_features(media).toPandas().set_index("media_id")
    for mid in ["img1", "img2", "vid1"]:
        va, vb = list(a.loc[mid, "feature"]), list(b.loc[mid, "feature"])
        assert va == vb
        assert len(va) == FEATURE_DIM
        assert abs(sum(x * x for x in va) - 1.0) < 1e-5


def test_frame_sampling_one_to_many(spark, media):
    frames = frame_sample_stub(media).toPandas()
    vid = frames[frames["media_id"] == "vid1"]
    assert len(vid) == 4  # 20000 bytes / 4096 -> 4 frames
    assert sorted(vid["frame_idx"]) == [0, 1, 2, 3]
    assert frames[frames["media_id"] == "bad1"].empty
