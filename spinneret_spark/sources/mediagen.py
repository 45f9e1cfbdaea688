"""Deterministic synthetic media corpus (image/audio binary columns).

Counterpart of :mod:`corpusgen` for the multimodal surface: emits
``(media_id, kind, blob)`` rows whose blobs are REAL containers —
minimal valid PNG / JPEG-marker-stream / GIF / WAV built with the
stdlib — plus a deterministic fraction of corrupt blobs, so the
header-decode gates in the media phase have something to reject.
Everything is a pure function of the row index: re-generation is
bit-identical across retries, partitionings, and engines.

Scale shape: generation is ``mapInPandas`` over a ``spark.range``
(one Arrow crossing, no driver-side materialization), exactly like
the page corpus generator.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "media_id string, kind string, blob binary"


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


def _blob_for_index(i: int) -> tuple[str, bytes]:
    """(kind, blob) as a pure function of the media index.

    Cycle of 10: 3 PNG, 2 JPEG, 2 GIF, 2 WAV, 1 corrupt. Dimensions /
    durations sweep deterministic ranges so resolution and duration
    gates split the corpus at predictable fractions.
    """
    slot = i % 10
    if slot < 3:  # png, widths 16..272 step 16
        w = 16 + (i % 17) * 16
        h = 16 + (i % 13) * 16
        return "image", make_png(w, h)
    if slot < 5:  # jpeg, big dimensions
        return "image", make_jpeg(320 + (i % 29) * 64, 240 + (i % 23) * 48)
    if slot < 7:  # gif, small dimensions
        return "image", make_gif(8 + (i % 11) * 8, 8 + (i % 7) * 8)
    if slot < 9:  # wav, 50..2450 ms
        return "audio", make_wav(50 + (i % 25) * 100)
    # deterministic junk: unrecognizable container
    return "image", (b"\x00JUNK" + i.to_bytes(8, "big")) * 4


def generate_media(
    spark: SparkSession, n: int, num_partitions: int = 8
) -> DataFrame:
    """n synthetic media rows, distributed generation."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, blobs, ids = [], [], []
            for i in pdf["id"]:
                kind, blob = _blob_for_index(int(i))
                ids.append(f"media-{int(i):09d}")
                kinds.append(kind)
                blobs.append(blob)
            yield pd.DataFrame(
                {"media_id": ids, "kind": kinds, "blob": blobs}
            )

    return spark.range(n, numPartitions=num_partitions).mapInPandas(
        kernel, schema=MEDIA_SCHEMA
    )
