"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

Header-level decode (width/height/duration) is REAL for PNG, JPEG,
GIF and WAV — pure-stdlib container parsing, no codec library needed.
Pixel/sample-level decode remains the honest seam: it dispatches to
PIL/ffmpeg when importable and raises otherwise (the sandbox ships
neither). ``deterministic_fake_features`` provides a seeded stand-in
so downstream operators (ANN over media embeddings, dedup by
perceptual hash) are exercisable end-to-end either way.
"""

from __future__ import annotations

import hashlib
import io
import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "media_id string, kind string, n_bytes long, checksum string, "
    "width int, height int, duration_ms long"
)

FEATURE_DIM = 16

FEATURES_SCHEMA = f"media_id string, feature array<float>"


def probe_media_header(blob: bytes) -> dict | None:
    """Container-format sniff + header parse, pure stdlib.

    Returns ``{"format", "width", "height", "duration_ms"}`` (image
    fields None for audio and vice versa) for PNG / JPEG / GIF / WAV,
    or ``None`` for anything unrecognized. This is real decoding of
    the container headers — the fields a 100 TB curation pipeline
    filters on (resolution floors, duration caps) — and needs no
    codec library, so it runs inside the Arrow kernel at full speed.
    """
    if blob is None or len(blob) < 12:
        return None
    # PNG: 8-byte signature, then the IHDR chunk (must be first) holds
    # big-endian width/height at fixed offsets 16..24
    if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR":
        w, h = struct.unpack(">II", blob[16:24])
        return {"format": "png", "width": w, "height": h,
                "duration_ms": None}
    # GIF: 6-byte signature, then little-endian logical screen size
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", blob[6:10])
        return {"format": "gif", "width": w, "height": h,
                "duration_ms": None}
    # JPEG: walk the marker stream to the first SOFn frame header
    # (C0–CF except the non-frame C4/C8/CC), which carries height then
    # width big-endian at offsets 5..9 of the segment
    if blob[:2] == b"\xff\xd8":
        i = 2
        n = len(blob)
        while i + 9 < n:
            if blob[i] != 0xFF:
                i += 1
                continue
            marker = blob[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = struct.unpack(">H", blob[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", blob[i + 5 : i + 9])
                return {"format": "jpeg", "width": w, "height": h,
                        "duration_ms": None}
            i += 2 + seg_len
        return None
    # WAV: RIFF container; the stdlib wave module reads frame count
    # and rate from the fmt chunk — duration in ms follows
    if blob[:4] == b"RIFF" and blob[8:12] == b"WAVE":
        import wave

        try:
            with wave.open(io.BytesIO(blob)) as wf:
                rate = wf.getframerate()
                ms = (
                    int(wf.getnframes() * 1000 / rate) if rate else None
                )
        except Exception:
            return None
        return {"format": "wav", "width": None, "height": None,
                "duration_ms": ms}
    return None


def decode_media(blob: bytes, kind: str) -> dict:
    """Full pixel/sample decode. Header fields come from
    :func:`probe_media_header` (pure stdlib, always available); the
    pixel/sample payload dispatches to PIL when importable — the
    REAL-DECODER SEAM — and raises otherwise (this sandbox ships no
    codec libraries). Curation-pipeline metadata never needs this
    path; only content-level transforms (resize, spectrogram) do."""
    header = probe_media_header(blob)
    if kind == "image":
        try:
            from PIL import Image
        except ImportError as exc:
            raise NotImplementedError(
                "pixel-level decoding requires PIL, absent in this "
                "environment; probe_media_header / extract_media_meta "
                "(header-level, real) and deterministic_fake_features "
                "(seeded stand-in) cover the pipeline surfaces"
            ) from exc
        img = Image.open(io.BytesIO(blob))
        return {**(header or {}), "pixels": np.asarray(img)}
    raise NotImplementedError(
        f"sample-level decoding for kind={kind!r} requires codec "
        "libraries not present in this environment"
    )


def extract_media_meta(media: DataFrame, id_col: str = "media_id",
                       blob_col: str = "blob", kind_col: str = "kind"
                       ) -> DataFrame:
    """Media metadata, all real: size + checksum (byte-level) and
    width/height/duration_ms from the container headers
    (:func:`probe_media_header`); fields stay null only when the blob
    isn't a recognized container.

    mapInPandas keeps one Arrow crossing per partition; binary columns
    arrive as zero-copy Arrow buffers.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, durs = [], [], []
            for b in pdf[blob_col]:
                hdr = probe_media_header(bytes(b)) if b is not None else None
                widths.append(hdr["width"] if hdr else None)
                heights.append(hdr["height"] if hdr else None)
                durs.append(hdr["duration_ms"] if hdr else None)
            out = pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype(str),
                    "kind": pdf[kind_col],
                    "n_bytes": [
                        len(b) if b is not None else 0 for b in pdf[blob_col]
                    ],
                    "checksum": [
                        hashlib.md5(bytes(b)).hexdigest() if b is not None else None
                        for b in pdf[blob_col]
                    ],
                    "width": pd.array(widths, dtype="Int32"),
                    "height": pd.array(heights, dtype="Int32"),
                    "duration_ms": pd.array(durs, dtype="Int64"),
                }
            )
            yield out

    return media.select(id_col, kind_col, blob_col).mapInPandas(
        kernel, schema=MEDIA_META_SCHEMA
    )


def deterministic_fake_features(media: DataFrame, id_col: str = "media_id",
                                blob_col: str = "blob") -> DataFrame:
    """Seeded stand-in for a feature extractor: FEATURE_DIM floats
    derived from the blob's md5 — deterministic, so ANN/dedup tests
    over 'media embeddings' are reproducible."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf[blob_col]:
                if b is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                digest = hashlib.md5(bytes(b)).digest()
                rng = np.random.RandomState(
                    int.from_bytes(digest[:4], "big")
                )
                v = rng.rand(FEATURE_DIM).astype("float32")
                feats.append((v / np.linalg.norm(v)).tolist())
            yield pd.DataFrame(
                {"media_id": pdf[id_col].astype(str), "feature": feats}
            )

    return media.select(id_col, blob_col).mapInPandas(
        kernel, schema=FEATURES_SCHEMA
    )


def frame_sample_stub(media: DataFrame, every_ms: int = 1000,
                      id_col: str = "media_id", blob_col: str = "blob"
                      ) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_idx,
    frame_checksum) rows — one-to-many via mapInPandas. The 'frames'
    are byte-slices at a stride derived from ``every_ms`` via a
    nominal 4 bytes/ms stand-in bitrate (STUB); a real decoder
    replaces the slicer only — the sampling-interval plumbing, batch
    shape and one-to-many fan-out are the real parts under test."""
    stride = max(1, every_ms * 4)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                raw = bytes(b)
                n_frames = max(1, len(raw) // stride)
                for i in range(min(n_frames, 16)):
                    chunk = raw[i * stride : (i + 1) * stride]
                    ids.append(str(mid))
                    idxs.append(i)
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return media.select(id_col, blob_col).mapInPandas(
        kernel, schema="media_id string, frame_idx int, frame_checksum string"
    )
