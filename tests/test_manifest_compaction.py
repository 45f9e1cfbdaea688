"""Manifest compaction (round-4 VERDICT item 4): rewrite the
append-only ``_manifest`` to latest-state rows in one file. Every
visibility decision — resume, consistent reads, replay-skip, state
tokens, the canonicalize snapshot — must be IDENTICAL pre/post."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from spinneret_spark import pipeline
from spinneret_spark.sinks import tables as sinks
from spinneret_spark.sources.corpusgen import generate_pages
from spinneret_spark.streaming.incremental import process_micro_batch

BUCKETS = 8


@pytest.fixture()
def busy_root(spark, tmp_path_factory, monkeypatch):
    """A root with real history: batch extract + two canonicalize
    snapshots + two streamed micro-batches + one crashed attempt
    (intent row, no marker)."""
    root = str(tmp_path_factory.mktemp("compact"))
    pages = generate_pages(
        spark, 150, near_dup_fraction=0.25, include_reference_eml=False
    )
    batch = pages.where(F.col("page_id") < 120)
    pipeline.run_extract_phase(spark, batch, root, "e1", buckets=BUCKETS)
    pipeline.run_canonicalize_phase(spark, root, "c1", buckets=BUCKETS)

    extra = pages.where(F.col("page_id") >= 120)
    process_micro_batch(extra.limit(15), 0, root, "s1", buckets=BUCKETS)
    process_micro_batch(extra.offset(15), 1, root, "s1", buckets=BUCKETS)
    pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)

    # crashed attempt: intent + data land, marker never does
    calls = {"n": 0}
    real = sinks.append_manifest_multi

    def crash_on_marker(session, r, run_id, rows, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("crash")
        return real(session, r, run_id, rows, **kw)

    monkeypatch.setattr(sinks, "append_manifest_multi", crash_on_marker)
    with pytest.raises(RuntimeError):
        process_micro_batch(extra.limit(15), 2, root, "s1", buckets=BUCKETS)
    monkeypatch.undo()
    return root


def _observable_state(spark, root):
    return {
        "resume": sinks.resume_state(spark, root, "triples"),
        "triples_committed": sinks.read_committed(
            spark, root, "triples"
        ).count(),
        "triples_consistent": sinks.read_streamed_consistent(
            spark, root, "triples"
        ).count(),
        "pages_durable": sinks.read_durable(
            spark, root, "pages_text"
        ).count(),
        "summary": sinks.manifest_summary(
            spark, root, ["pages_text", "triples"]
        ),
        "tokens": sinks.pages_state_tokens(spark, root, "pages_text"),
        "canon": sinks.latest_canon_state(spark, root),
        "markers": sinks.stream_marker_runs(spark, root, "triples"),
    }


def test_compaction_preserves_every_visibility_decision(spark, busy_root):
    before = _observable_state(spark, busy_root)
    assert before["canon"] is not None and before["markers"]

    stats = sinks.compact_manifest(spark, busy_root)
    assert stats["rows_after"] < stats["rows_before"]
    assert stats["files_after"] == 1 < stats["files_before"]

    after = _observable_state(spark, busy_root)
    assert after == before

    # the crashed attempt's evidence survived (intent row kept):
    # orphan rows remain invisible, and vacuum can still reclaim them
    assert sinks.vacuum_streamed(spark, busy_root, "pages_text",
                                 grace_seconds=0) > 0
    assert (
        sinks.read_durable(spark, busy_root, "pages_text").count()
        == before["pages_durable"]
    )

    # replay of a completed batch still no-ops after compaction
    pages = generate_pages(
        spark, 150, near_dup_fraction=0.25, include_reference_eml=False
    )
    extra = pages.where(F.col("page_id") >= 120)
    process_micro_batch(extra.limit(15), 0, busy_root, "s1", buckets=BUCKETS)
    assert (
        sinks.read_streamed_consistent(spark, busy_root, "triples").count()
        == before["triples_consistent"]
    )

    # delta canonicalize still sees the (compacted) snapshot: the
    # crashed attempt left no marker, so no token changed since c2 —
    # zero parts re-shingled
    s = pipeline.run_canonicalize_phase(spark, busy_root, "c3",
                                        buckets=BUCKETS)
    assert s["delta"] is True and s["parts_reshingled"] == 0

    # idempotent: a second compaction keeps the same rows
    again = sinks.compact_manifest(spark, busy_root)
    assert _observable_state(spark, busy_root)["canon"] is not None


def test_compaction_crash_recovery(spark, tmp_path_factory):
    """A swap interrupted between the two renames must be restored by
    the next compact (or any compact attempt) instead of presenting a
    missing manifest."""
    root = str(tmp_path_factory.mktemp("compact_crash"))
    pages = generate_pages(
        spark, 40, near_dup_fraction=0.2, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "e1", buckets=4)
    before = sinks.resume_state(spark, root, "triples")

    # simulate the crash window: manifest renamed away, new one not
    # yet in place
    path = sinks.manifest_path(root)
    os.rename(path, path + "__old")
    stats = sinks.compact_manifest(spark, root)
    assert stats["rows_after"] > 0
    assert sinks.resume_state(spark, root, "triples") == before


def test_compaction_on_missing_manifest_is_noop(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("compact_empty"))
    assert sinks.compact_manifest(spark, root)["rows_before"] == 0
