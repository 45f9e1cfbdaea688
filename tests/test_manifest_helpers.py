"""Manifest-helper semantics: the commit protocol's driver-side reads
(committed_row_total, resume_state, recorded_buckets) against
hand-crafted manifests — including the crash-rewrite double-commit
case that must not double count."""

from __future__ import annotations

import datetime

from spinneret_spark.sinks import tables as sinks


def _write(spark, root, rows):
    """rows: (run_id, table, part_id, status, rows_out, committed_at)"""
    spark.createDataFrame(rows, sinks.MANIFEST_SCHEMA).write.mode(
        "append"
    ).parquet(sinks.manifest_path(root))


def test_committed_row_total_latest_commit_per_part_wins(spark, tmp_path):
    root = str(tmp_path)
    t1 = datetime.datetime(2026, 1, 1)
    t2 = datetime.datetime(2026, 1, 2)
    _write(
        spark,
        root,
        [
            ("r1", "pages_text", 0, "committed", 100, t1),
            ("r1", "pages_text", 1, "committed", 50, t1),
            # part 0 re-committed after a crash-rewrite: only the later
            # count may enter the total
            ("r2", "pages_text", 0, "committed", 120, t2),
            # other tables and non-committed statuses are invisible
            ("r1", "triples", 0, "committed", 999, t1),
            ("s1-b0", "pages_text", 1, "streamed", 999, t2),
        ],
    )
    assert sinks.committed_row_total(spark, root, "pages_text") == 170


def test_committed_row_total_none_without_manifest(spark, tmp_path):
    assert sinks.committed_row_total(spark, str(tmp_path), "pages_text") is None
    root = str(tmp_path)
    _write(
        spark,
        root,
        [("r1", "triples", 0, "committed", 5, datetime.datetime(2026, 1, 1))],
    )
    assert sinks.committed_row_total(spark, root, "pages_text") is None


def test_resume_state_one_read_matches_parts_and_buckets(spark, tmp_path):
    root = str(tmp_path)
    t = datetime.datetime(2026, 1, 1)
    _write(
        spark,
        root,
        [
            ("r1", "triples", 0, "committed", 10, t),
            ("r1", "triples", 2, "committed", 10, t),
            ("r1", "triples", 8, sinks.BUCKETS_META, 0, t),
            # streamed rows and markers must NOT count as batch commits
            ("s1-b0", "triples", 1, "streamed", 10, t),
            ("s1-b0", "triples", -1, sinks.BATCH_MARKER, 10, t),
        ],
    )
    done, buckets = sinks.resume_state(spark, root, "triples")
    assert done == {0, 2}
    assert buckets == {8}
    assert sinks.recorded_buckets(spark, root, "triples") == {8}
    assert sinks.manifest_run_exists(spark, root, "s1-b0", "triples")
    assert not sinks.manifest_run_exists(spark, root, "s1-b1", "triples")


def test_resume_state_empty_without_manifest(spark, tmp_path):
    assert sinks.resume_state(spark, str(tmp_path), "triples") == (set(), set())
