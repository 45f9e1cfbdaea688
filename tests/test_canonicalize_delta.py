"""Incremental (delta) canonicalization (round-4 VERDICT item 2):
an appended corpus must re-pay the Arrow shingle/MinHash kernel only
for parts whose content changed, reuse persisted signatures and prior
verified edges everywhere else, and still produce outputs equal to a
from-scratch recompute."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spinneret_spark import pipeline
from spinneret_spark.sinks import tables as sinks
from spinneret_spark.sources.corpusgen import generate_pages
from spinneret_spark.streaming.incremental import process_micro_batch

BUCKETS = 16


def _table_snapshot(spark, root):
    """Sorted content of the three canonical outputs, part_id-free."""
    out = {}
    for tbl, cols in [
        ("edges", ["id_a", "id_b"]),
        ("entities", ["canonical_id", "n_members"]),
        ("triples_canonical", ["subj", "pred_id", "obj_id"]),
    ]:
        if pipeline._partition_ids(root, tbl):
            rows = (
                sinks.read_table(spark, root, tbl)
                .select(*cols)
                .collect()
            )
            out[tbl] = sorted(tuple(r) for r in rows)
        else:
            out[tbl] = []
    return out


def test_delta_canonicalize_reshingles_only_changed_parts_and_matches_scratch(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("canon_delta"))
    pages = generate_pages(
        spark, 300, near_dup_fraction=0.25, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "e1", buckets=BUCKETS)

    # run 1: no snapshot exists → full path, which persists
    # signatures + the per-part state tokens
    s1 = pipeline.run_canonicalize_phase(spark, root, "c1", buckets=BUCKETS)
    assert s1["delta"] is False
    assert s1["parts_reshingled"] == s1["parts_total"] > 0
    assert pipeline._partition_ids(root, "canon_signatures")
    snap = sinks.latest_canon_state(spark, root)
    assert snap is not None and snap["parts"]

    # corpus growth arrives via streaming (batch resume skips
    # committed parts by design): 20 genuinely new pages
    new_pages = generate_pages(
        spark, 320, near_dup_fraction=0.25, include_reference_eml=False
    ).where(F.col("page_id") >= 300)
    assert new_pages.count() == 20
    process_micro_batch(new_pages, 0, root, "s1", buckets=BUCKETS)
    changed_parts = {
        r["part_id"]
        for r in new_pages.select(
            F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int").alias(
                "part_id"
            )
        )
        .distinct()
        .collect()
    }
    assert 0 < len(changed_parts) < s1["parts_total"]

    # run 2: delta — exactly the streamed-into parts re-shingled
    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2["delta"] is True
    assert s2["parts_reshingled"] == len(changed_parts)
    assert s2["parts_total"] >= s1["parts_total"]
    got = _table_snapshot(spark, root)
    assert got["edges"] and got["entities"] and got["triples_canonical"]

    # the delta path's audit trail: lineage rows name exactly the
    # changed parts as re-shingled for run c2
    lineage = spark.read.parquet(sinks.lineage_path(root))
    reshingled = {
        r["part_id"]
        for r in lineage.filter(
            (F.col("run_id") == "c2")
            & (F.col("stage") == "canonicalize:reshingle")
        )
        .select("part_id")
        .collect()
    }
    assert reshingled == changed_parts

    # run 3: forced from-scratch recompute must agree exactly
    s3 = pipeline.run_canonicalize_phase(
        spark, root, "c3", buckets=BUCKETS, incremental=False
    )
    assert s3["delta"] is False
    want = _table_snapshot(spark, root)
    assert got == want
    assert (s2["n_entities"], s2["n_edges"], s2["n_canonical_triples"]) == (
        s3["n_entities"], s3["n_edges"], s3["n_canonical_triples"]
    )

    # run 4: nothing changed since c3's snapshot → zero parts pay the
    # kernel, outputs identical
    s4 = pipeline.run_canonicalize_phase(spark, root, "c4", buckets=BUCKETS)
    assert s4["delta"] is True
    assert s4["parts_reshingled"] == 0
    assert _table_snapshot(spark, root) == want


def test_parameter_change_falls_back_to_full(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("canon_params"))
    pages = generate_pages(
        spark, 120, near_dup_fraction=0.3, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "e1", buckets=4)
    s1 = pipeline.run_canonicalize_phase(
        spark, root, "c1", jaccard_threshold=0.5, buckets=4
    )
    assert s1["delta"] is False
    # same threshold → delta; different threshold → the persisted
    # edges' verdicts are invalid, full recompute
    s2 = pipeline.run_canonicalize_phase(
        spark, root, "c2", jaccard_threshold=0.5, buckets=4
    )
    assert s2["delta"] is True and s2["parts_reshingled"] == 0
    s3 = pipeline.run_canonicalize_phase(
        spark, root, "c3", jaccard_threshold=0.9, buckets=4
    )
    assert s3["delta"] is False
    assert s3["parts_reshingled"] == s3["parts_total"]


def _output_files(root):
    import glob
    import os

    return {
        tbl: sorted(
            glob.glob(os.path.join(root, tbl, "part_id=*", "*.parquet"))
        )
        for tbl in ("edges", "entities", "triples_canonical")
    }


def test_zero_change_short_circuit_skips_rewrite(spark, tmp_path_factory):
    """A rerun with zero changed parts must not touch the output
    tables at all — manifest + footer-count reads only (the
    zero-change floor was ~19 s at 400k before this)."""
    root = str(tmp_path_factory.mktemp("canon_sc"))
    pages = generate_pages(
        spark, 200, near_dup_fraction=0.3, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "e1", buckets=BUCKETS)
    s1 = pipeline.run_canonicalize_phase(spark, root, "c1", buckets=BUCKETS)
    files_before = _output_files(root)

    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2.get("short_circuit") is True
    assert s2["delta"] is True and s2["parts_reshingled"] == 0
    assert (s2["n_entities"], s2["n_edges"], s2["n_canonical_triples"]) == (
        s1["n_entities"], s1["n_edges"], s1["n_canonical_triples"]
    )
    # a rewrite would produce fresh part-file names; identical listings
    # prove the tables were never written
    assert _output_files(root) == files_before


def test_short_circuit_integrity_guard_self_heals(spark, tmp_path_factory):
    """A previously crashed zero-change overwrite (simulated by a
    missing output part file) must NOT be certified by the
    short-circuit: the count-vs-manifest check fails and the normal
    path rebuilds the outputs from persisted signatures."""
    import os

    root = str(tmp_path_factory.mktemp("canon_heal"))
    pages = generate_pages(
        spark, 200, near_dup_fraction=0.3, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "e1", buckets=BUCKETS)
    s1 = pipeline.run_canonicalize_phase(spark, root, "c1", buckets=BUCKETS)

    victim = _output_files(root)["entities"][0]
    os.remove(victim)

    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert "short_circuit" not in s2
    assert s2["delta"] is True and s2["parts_reshingled"] == 0
    assert (s2["n_entities"], s2["n_edges"], s2["n_canonical_triples"]) == (
        s1["n_entities"], s1["n_edges"], s1["n_canonical_triples"]
    )
    # healed: a fresh rerun may short-circuit again
    s3 = pipeline.run_canonicalize_phase(spark, root, "c3", buckets=BUCKETS)
    assert s3.get("short_circuit") is True
