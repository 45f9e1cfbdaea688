"""Generic durable streamed-append contract (streaming/durable.py):
the single-table generalization of the incremental skin's manifest/
marker semantics, used by the windowed and stateful skins (round-4
VERDICT item 1). Mirrors test_streaming.py's replay/orphan/vacuum
suite against the generic helper."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spinneret_spark.sinks import tables as sinks
from spinneret_spark.streaming.durable import append_micro_batch

SCHEMA = "k string, v long"
BUCKETS = 4


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_replayed_batch_is_noop(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dur_replay"))
    b = _batch(spark, [("a", 1), ("b", 2), ("c", 3)])
    n1 = append_micro_batch(b, 0, root, "t", "r", ("k",), BUCKETS)
    assert n1 == 3
    # checkpoint redelivery: same run/batch id → nothing appended
    n2 = append_micro_batch(b, 0, root, "t", "r", ("k",), BUCKETS)
    assert n2 == 0
    assert sinks.read_streamed_consistent(spark, root, "t").count() == 3
    # a NEW batch id appends
    assert append_micro_batch(
        _batch(spark, [("d", 4)]), 1, root, "t", "r", ("k",), BUCKETS
    ) == 1
    assert sinks.read_streamed_consistent(spark, root, "t").count() == 4


def test_orphan_attempt_rows_stay_invisible_and_vacuum(
    spark, tmp_path_factory, monkeypatch
):
    """Crash between the data append and the marker write: the intent
    row (written pre-append) is the evidence that keeps the orphan
    rows out of every consistent view, and vacuum reclaims them."""
    root = str(tmp_path_factory.mktemp("dur_orphan"))
    append_micro_batch(
        _batch(spark, [("a", 1), ("b", 2)]), 0, root, "t", "r",
        ("k",), BUCKETS,
    )

    calls = {"n": 0}
    real = sinks.append_manifest_multi

    def crash_on_marker(session, r, run_id, rows, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:  # 1st = intent row, 2nd = marker commit
            raise RuntimeError("crash before marker")
        return real(session, r, run_id, rows, **kw)

    monkeypatch.setattr(sinks, "append_manifest_multi", crash_on_marker)
    with pytest.raises(RuntimeError, match="crash before marker"):
        append_micro_batch(
            _batch(spark, [("x", 9), ("y", 8)]), 1, root, "t", "r",
            ("k",), BUCKETS,
        )
    monkeypatch.undo()

    raw = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(root, "t")
    )
    assert raw.count() == 4, "orphan rows should be on disk"
    assert sinks.read_streamed_consistent(spark, root, "t").count() == 2

    # replay of the crashed batch (fresh attempt id) lands it
    assert append_micro_batch(
        _batch(spark, [("x", 9), ("y", 8)]), 1, root, "t", "r",
        ("k",), BUCKETS,
    ) == 2
    assert sinks.read_streamed_consistent(spark, root, "t").count() == 4

    # vacuum reclaims the crashed attempt's bytes; view unchanged
    assert sinks.vacuum_streamed(spark, root, "t", grace_seconds=0) > 0
    assert sinks.read_streamed_consistent(spark, root, "t").count() == 4


def test_bucket_count_mismatch_fails_loudly(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("dur_buckets"))
    append_micro_batch(
        _batch(spark, [("a", 1)]), 0, root, "t", "r", ("k",), 4
    )
    with pytest.raises(ValueError, match="buckets"):
        append_micro_batch(
            _batch(spark, [("b", 2)]), 1, root, "t", "r", ("k",), 8
        )


def test_part_id_is_key_hash_and_streamed_totals(spark, tmp_path_factory):
    """Bucketing co-locates a key's history (the read-without-shuffle
    property the docstring promises), and manifest_summary's streamed
    total matches without a count job."""
    root = str(tmp_path_factory.mktemp("dur_parts"))
    append_micro_batch(
        _batch(spark, [("a", 1), ("b", 2)]), 0, root, "t", "r",
        ("k",), BUCKETS,
    )
    append_micro_batch(
        _batch(spark, [("a", 10), ("b", 20)]), 1, root, "t", "r",
        ("k",), BUCKETS,
    )
    got = sinks.read_streamed_consistent(spark, root, "t")
    per_key_parts = (
        got.withColumn(
            "want",
            F.pmod(F.xxhash64("k"), F.lit(BUCKETS)).cast("int"),
        )
        .where(F.col("part_id") != F.col("want"))
        .count()
    )
    assert per_key_parts == 0
    summ = sinks.manifest_summary(spark, root, ["t"])["t"]
    assert summ["streamed_total"] == 4
