"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The decode kernels are STUBS by design — the sandbox ships no
image/audio codecs — but everything Spark-side is real and tested:
schemas, partitioning, UDF signatures, Arrow batch shapes, and the
dispatch seam where a real decoder (PIL/torchaudio/ffmpeg) drops in.
``deterministic_fake_features`` provides a seeded stand-in so
downstream operators (ANN over media embeddings, dedup by perceptual
hash) are exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
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


def decode_media(blob: bytes, kind: str) -> dict:
    """REAL-DECODER SEAM. Replace with PIL/ffmpeg on a cluster that
    has codecs; the sandbox has none, so only byte-level metadata is
    real and pixel-level fields raise."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this "
        "environment; use extract_media_meta (byte-level, real) or "
        "deterministic_fake_features (seeded stand-in)"
    )


def extract_media_meta(media: DataFrame, id_col: str = "media_id",
                       blob_col: str = "blob", kind_col: str = "kind"
                       ) -> DataFrame:
    """Byte-level metadata (real): size + checksum; pixel fields null.

    mapInPandas keeps one Arrow crossing per partition; binary columns
    arrive as zero-copy Arrow buffers.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
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
                    "width": pd.array([None] * len(pdf), dtype="Int32"),
                    "height": pd.array([None] * len(pdf), dtype="Int32"),
                    "duration_ms": pd.array([None] * len(pdf), dtype="Int64"),
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
    are byte-slices (STUB); a real decoder replaces the slicer only."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for mid, b in zip(pdf[id_col], pdf[blob_col]):
                if b is None:
                    continue
                raw = bytes(b)
                n_frames = max(1, len(raw) // 4096)
                for i in range(min(n_frames, 16)):
                    chunk = raw[i * 4096 : (i + 1) * 4096]
                    ids.append(str(mid))
                    idxs.append(i)
                    sums.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_checksum": sums}
            )

    return media.select(id_col, blob_col).mapInPandas(
        kernel, schema="media_id string, frame_idx int, frame_checksum string"
    )
