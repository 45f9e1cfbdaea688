"""run_curation_phase: the training-data curation funnel as a durable
pipeline phase (dedup → quality → sample → pack → manifested table)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spinneret_spark import pipeline
from spinneret_spark.sinks import tables as sinks
from spinneret_spark.sources.corpusgen import generate_pages

BUCKETS = 8


@pytest.fixture(scope="module")
def kg_root(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kg_curate"))
    pages = generate_pages(
        spark, 120, include_reference_eml=False, near_dup_fraction=0.3
    )
    pipeline.run(spark, pages, root, "run1", buckets=BUCKETS,
                 canonicalize=False)
    return root


def test_curation_funnel_and_table(spark, kg_root):
    stats = pipeline.run_curation_phase(spark, kg_root, "run1",
                                        buckets=BUCKETS)
    # monotone funnel, nothing negative, stats equal disk
    assert (
        stats["n_in"]
        >= stats["n_after_dedup"]
        >= stats["n_after_quality"]
        >= stats["n_curated"]
        > 0
    )
    # the near-dup farm guarantees exact clones -> dedup really drops
    assert stats["n_after_dedup"] < stats["n_in"]
    curated = sinks.read_table(spark, kg_root, "pages_curated")
    assert curated.count() == stats["n_curated"]
    # content-unique by construction
    assert (
        curated.select("fingerprint").distinct().count() == curated.count()
    )
    # packing covers chunk ids [0, n_chunks) with no holes
    spans = curated.select(
        F.explode(
            F.sequence("chunk_id", F.col("chunk_id") + F.col("n_chunks") - 1)
        ).alias("c")
    )
    seen = {r["c"] for r in spans.distinct().collect()}
    assert seen == set(range(stats["n_chunks"]))
    # lineage carries the funnel
    lin = spark.read.parquet(sinks.lineage_path(kg_root))
    stages = {r["stage"] for r in lin.select("stage").distinct().collect()}
    assert {"curate:input", "curate:dedup", "curate:quality",
            "curate:sample", "curate:pack", "curate:write"} <= stages


def test_curation_sample_fraction_reduces(spark, kg_root):
    full = pipeline.run_curation_phase(spark, kg_root, "run2",
                                       buckets=BUCKETS)
    half = pipeline.run_curation_phase(
        spark, kg_root, "run3", buckets=BUCKETS, sample_fraction=0.4
    )
    assert 0 < half["n_curated"] < full["n_curated"]
    # static overwrite: disk reflects the LATEST run only
    assert (
        sinks.read_table(spark, kg_root, "pages_curated").count()
        == half["n_curated"]
    )


def test_curation_on_empty_corpus(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("kg_curate_empty"))
    stats = pipeline.run_curation_phase(spark, root, "run1")
    assert stats["n_in"] == stats["n_curated"] == 0


def test_curation_sample_zero_writes_nothing(spark, kg_root):
    """sample_fraction=0: the funnel reports zero curated rows and no
    pages_curated files exist (no-files guard, not a crash)."""
    stats = pipeline.run_curation_phase(
        spark, kg_root, "run-zero", buckets=BUCKETS, sample_fraction=0.0
    )
    assert stats["n_curated"] == 0
    assert stats["n_chunks"] == 0
    assert stats["n_after_dedup"] > 0


def test_n_in_falls_back_on_partial_pages_text_coverage(
    spark, tmp_path_factory
):
    """Round-3 ADVICE (medium): on a legacy out_root where only SOME
    parts carry pages_text commits, the manifest total is a silent
    undercount — n_in must fall back to the corpus count, not report
    the partial number."""
    root = str(tmp_path_factory.mktemp("kg_legacy_nin"))
    pages = generate_pages(
        spark, 100, include_reference_eml=False, near_dup_fraction=0.2
    )
    pipeline.run(spark, pages, root, "run1", buckets=BUCKETS,
                 canonicalize=False)
    true_n = sinks.read_table(spark, root, "pages_text").count()

    # simulate the legacy manifest: drop pages_text commits for half
    # the parts (the old code never wrote them; resume keeps them out)
    m = spark.read.parquet(sinks.manifest_path(root)).filter(
        ~(
            (F.col("table_name") == "pages_text")
            & (F.col("part_id") >= BUCKETS // 2)
        )
    )
    kept = m.collect()
    import shutil

    shutil.rmtree(sinks.manifest_path(root))
    spark.createDataFrame(kept, sinks.MANIFEST_SCHEMA).write.parquet(
        sinks.manifest_path(root)
    )
    partial = sinks.committed_row_total(spark, root, "pages_text")
    assert partial is not None and partial < true_n  # the trap exists

    stats = pipeline.run_curation_phase(spark, root, "legacy",
                                        buckets=BUCKETS)
    assert stats["n_in"] == true_n, (
        f"n_in={stats['n_in']} took the partial manifest total "
        f"{partial} instead of the corpus count {true_n}"
    )


def test_curation_phase_crash_rerun_converges(
    spark, kg_root, tmp_path_factory, monkeypatch
):
    """VERDICT r3 item 7: a curation run killed between the
    pages_curated write and its manifest append must leave only
    invisible data, and a plain rerun must converge to the clean-run
    state (static overwrite + manifest totals matching disk)."""
    import os
    import shutil as _shutil

    def boom(*a, **k):
        raise RuntimeError("simulated crash before manifest commit")

    monkeypatch.setattr(sinks, "append_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        pipeline.run_curation_phase(spark, kg_root, "crash", buckets=BUCKETS)
    monkeypatch.undo()

    # drop half the written part dirs too (kill-after-k-parts shape)
    parts = pipeline._partition_ids(kg_root, "pages_curated")
    assert parts
    for p in parts[: len(parts) // 2]:
        _shutil.rmtree(
            os.path.join(kg_root, "pages_curated", f"part_id={p}")
        )

    stats = pipeline.run_curation_phase(spark, kg_root, "rerun",
                                        buckets=BUCKETS)
    curated = sinks.read_committed(spark, kg_root, "pages_curated",
                                   latest_run_only=True)
    assert curated.count() == stats["n_curated"] > 0
    assert (
        curated.select("fingerprint").distinct().count() == curated.count()
    )
