"""Multimodal plumbing: real byte- and header-level paths, seam-gated
pixel decoders, deterministic fake features (task brief: stub the
decode, make the Spark-side schema/partitioning/UDF-signature/
batch-shape real — header parsing is pure stdlib, so it is real)."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import pytest

from spinneret_spark.operators.multimodal import (
    decode_media,
    deterministic_fake_features,
    extract_media_meta,
    frame_sample_stub,
    probe_media_header,
    FEATURE_DIM,
)


def make_png(w: int, h: int) -> bytes:
    """Minimal valid grayscale PNG, stdlib-only."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x80" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def make_jpeg(w: int, h: int) -> bytes:
    """JPEG marker stream up to a valid SOF0 frame header."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 6


def make_wav(ms: int, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x00" * (rate * ms // 1000))
    return buf.getvalue()


def test_probe_media_header_real_formats():
    assert probe_media_header(make_png(640, 480)) == {
        "format": "png", "width": 640, "height": 480, "duration_ms": None
    }
    assert probe_media_header(make_jpeg(1920, 1080)) == {
        "format": "jpeg", "width": 1920, "height": 1080,
        "duration_ms": None
    }
    assert probe_media_header(make_gif(32, 16)) == {
        "format": "gif", "width": 32, "height": 16, "duration_ms": None
    }
    wav = probe_media_header(make_wav(1500))
    assert wav["format"] == "wav" and wav["duration_ms"] == 1500
    assert probe_media_header(b"\x00" * 64) is None
    assert probe_media_header(None) is None


def test_media_meta_header_fields(spark):
    rows = [
        ("png1", "image", bytearray(make_png(640, 480))),
        ("jpg1", "image", bytearray(make_jpeg(300, 200))),
        ("wav1", "audio", bytearray(make_wav(2000))),
        ("raw1", "video", bytearray(b"\x00" * 4096)),
    ]
    media = spark.createDataFrame(
        rows, "media_id string, kind string, blob binary"
    )
    out = extract_media_meta(media).toPandas().set_index("media_id")
    assert out.loc["png1", "width"] == 640
    assert out.loc["png1", "height"] == 480
    assert out.loc["jpg1", "width"] == 300
    assert out.loc["wav1", "duration_ms"] == 2000
    # unrecognized container: header fields null, byte fields real
    assert out.loc["raw1"][["width", "height", "duration_ms"]].isna().all()
    assert out.loc["raw1", "n_bytes"] == 4096


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


def test_pixel_decode_is_gated_seam():
    # header probe is real; the pixel/sample payload needs PIL/ffmpeg,
    # absent here — the seam must raise, not silently fake pixels
    with pytest.raises(NotImplementedError):
        decode_media(make_png(8, 8), "image")
    with pytest.raises(NotImplementedError):
        decode_media(make_wav(100), "audio")


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
    # stride = every_ms(1000) * 4 B/ms -> 20000 bytes / 4000 -> 5 frames
    assert len(vid) == 5
    assert sorted(vid["frame_idx"]) == [0, 1, 2, 3, 4]
    assert frames[frames["media_id"] == "bad1"].empty
    # halving the interval doubles the sampled frames
    dense = frame_sample_stub(media, every_ms=500).toPandas()
    assert len(dense[dense["media_id"] == "vid1"]) == 10


def test_media_phase_end_to_end(spark, tmp_path_factory):
    """run_media_phase: header decode -> gates -> media_meta +
    media_curated with manifest + funnel lineage, mirroring the text
    curation phase's contract."""
    from pyspark.sql import functions as F

    from spinneret_spark import pipeline
    from spinneret_spark.sinks import tables as sinks
    from spinneret_spark.sources.mediagen import generate_media

    out_root = str(tmp_path_factory.mktemp("media_phase"))
    media = generate_media(spark, 200, num_partitions=4)
    stats = pipeline.run_media_phase(
        spark, media, out_root, "m1", buckets=4,
        min_width=64, min_height=64, max_duration_ms=1500,
    )
    assert stats["n_in"] == 200
    # 1 in 10 generated blobs is junk -> exactly 180 decode
    assert stats["n_decoded"] == 180
    assert 0 < stats["n_kept"] < stats["n_decoded"]

    meta = sinks.read_committed(spark, out_root, "media_meta")
    curated = sinks.read_committed(spark, out_root, "media_curated")
    assert meta.count() == 200
    assert curated.count() == stats["n_kept"]
    # every gate holds on the curated table
    bad = curated.where(
        ~(
            (F.col("width").isNotNull() & (F.col("width") >= 64)
             & (F.col("height") >= 64))
            | (F.col("duration_ms").isNotNull()
               & (F.col("duration_ms") <= 1500))
        )
    ).count()
    assert bad == 0
    # junk blobs never reach the curated table
    assert curated.where(F.col("width").isNull()
                         & F.col("duration_ms").isNull()).count() == 0

    funnel = (
        spark.read.parquet(sinks.lineage_path(out_root))
        .where(F.col("stage").startswith("media:"))
        .toPandas()
        .set_index("stage")["value"]
    )
    assert funnel.loc["media:input"] == 200.0
    assert funnel.loc["media:decoded"] == 180.0
    assert funnel.loc["media:kept"] == float(stats["n_kept"])


def test_generate_media_deterministic(spark):
    from spinneret_spark.sources.mediagen import generate_media

    a = generate_media(spark, 50, num_partitions=2).toPandas()
    b = generate_media(spark, 50, num_partitions=5).toPandas()
    a = a.sort_values("media_id").reset_index(drop=True)
    b = b.sort_values("media_id").reset_index(drop=True)
    assert (a["media_id"] == b["media_id"]).all()
    assert all(bytes(x) == bytes(y) for x, y in zip(a["blob"], b["blob"]))


def test_media_phase_crash_rerun_converges(spark, tmp_path_factory, monkeypatch):
    """VERDICT r3 item 7: a media run killed between its table writes
    and its manifest append leaves uncommitted (invisible) data; a
    plain rerun must converge to exactly the clean-run state — static
    overwrite replaces the partial tables wholesale, and the manifest
    totals match disk."""
    from spinneret_spark import pipeline
    from spinneret_spark.sinks import tables as sinks
    from spinneret_spark.sources.mediagen import generate_media

    media = generate_media(spark, 200, num_partitions=4).cache()
    media.count()

    clean_root = str(tmp_path_factory.mktemp("media_clean"))
    want = pipeline.run_media_phase(spark, media, clean_root, "c1", buckets=4)

    crash_root = str(tmp_path_factory.mktemp("media_crash"))

    def boom(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(sinks, "append_manifest_multi", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipeline.run_media_phase(spark, media, crash_root, "c2", buckets=4)
    monkeypatch.undo()

    # data landed but nothing is committed — the consistent view is empty
    assert not sinks.read_committed(spark, crash_root, "media_curated").head(1)

    # make the partial state worse: drop half the written part dirs
    # (kill-after-k-parts shape)
    import os
    import shutil as _shutil

    for tbl in ("media_meta", "media_curated"):
        parts = pipeline._partition_ids(crash_root, tbl)
        for p in parts[: len(parts) // 2]:
            _shutil.rmtree(os.path.join(crash_root, tbl, f"part_id={p}"))

    got = pipeline.run_media_phase(spark, media, crash_root, "c3", buckets=4)
    assert (got["n_in"], got["n_decoded"], got["n_kept"]) == (
        want["n_in"], want["n_decoded"], want["n_kept"],
    )
    for tbl in ("media_meta", "media_curated"):
        a = sorted(
            r["media_id"]
            for r in sinks.read_committed(spark, crash_root, tbl)
            .select("media_id").collect()
        )
        b = sorted(
            r["media_id"]
            for r in sinks.read_committed(spark, clean_root, tbl)
            .select("media_id").collect()
        )
        assert a == b and a, f"{tbl} diverged after crash+rerun"
    media.unpersist()
