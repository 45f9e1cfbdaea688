"""Composed (incremental) assignment: an additive micro-batch must
skip the full-corpus CC + docs scan entirely — the new assignment is
the persisted one composed with a supernode remap — while producing
outputs identical to a from-scratch recompute, including when a new
doc MERGES existing components across unchanged parts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spinneret_spark import pipeline
from spinneret_spark.sinks import tables as sinks
from spinneret_spark.sources.corpusgen import generate_pages
from spinneret_spark.streaming.incremental import process_micro_batch

BUCKETS = 16


def _canon_snapshot(spark, root):
    out = {}
    for tbl, cols in [
        ("edges", ["id_a", "id_b"]),
        ("entities", ["canonical_id", "n_members", "members"]),
        ("triples_canonical", ["subj", "pred_id", "obj_id"]),
    ]:
        if pipeline._partition_ids(root, tbl):
            rows = sinks.read_table(spark, root, tbl).select(*cols).collect()
            out[tbl] = sorted(
                tuple(
                    tuple(v) if isinstance(v, list) else v for v in r
                )
                for r in rows
            )
        else:
            out[tbl] = []
    return out


def test_additive_append_composes_and_matches_scratch(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("compose"))
    pages = generate_pages(
        spark, 250, near_dup_fraction=0.25, include_reference_eml=False
    ).cache()
    pipeline.run(spark, pages, root, "r1", buckets=BUCKETS)

    s0 = pipeline.run_canonicalize_phase(spark, root, "c0", buckets=BUCKETS)
    assert s0.get("short_circuit") is True

    new_pages = generate_pages(
        spark, 270, near_dup_fraction=0.25, include_reference_eml=False
    ).where(F.col("page_id") >= 250)
    process_micro_batch(new_pages, 0, root, "s1", buckets=BUCKETS)
    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2["delta"] is True
    assert s2["assignment"] == "composed"

    root2 = str(tmp_path_factory.mktemp("compose_scratch"))
    pipeline.run(
        spark, pages.unionByName(new_pages), root2, "rA", buckets=BUCKETS
    )
    assert _canon_snapshot(spark, root) == _canon_snapshot(spark, root2)

    # the composed run's snapshot must certify a clean short-circuit
    # (partial entity commits + carried-over assign hashes included)
    s3 = pipeline.run_canonicalize_phase(spark, root, "c3", buckets=BUCKETS)
    assert s3.get("short_circuit") is True
    pages.unpersist()


def test_cross_part_merge_relabels_unchanged_parts(
    spark, tmp_path_factory
):
    """A new doc that (a) near-dups an existing cluster and (b) sorts
    below its canonical id forces every member — docs in parts the
    increment never touched — onto a new canonical. The composed path
    must relabel them, rewrite their entity row and canonical-triple
    homes, and still equal a from-scratch run."""
    root = str(tmp_path_factory.mktemp("merge"))
    pages = generate_pages(
        spark, 250, near_dup_fraction=0.25, include_reference_eml=False
    ).cache()
    pipeline.run(spark, pages, root, "r1", buckets=BUCKETS)

    # an existing multi-member cluster and one of its docs' text
    ent = (
        sinks.read_table(spark, root, "entities")
        .where(F.col("n_members") >= 2)
        .first()
    )
    assert ent is not None
    donor_url = ent["members"][0]
    donor_text = (
        sinks.read_table(spark, root, "pages_text")
        .where(F.col("url") == donor_url)
        .first()["text"]
    )
    bridge_url = "https://aaa.example.org/crawl/bridge-0"
    assert bridge_url < ent["canonical_id"]
    bridge = (
        generate_pages(
            spark, 251, near_dup_fraction=0.0, include_reference_eml=False
        )
        .where(F.col("page_id") == 250)
        .withColumn("url", F.lit(bridge_url))
        .withColumn("text", F.lit(donor_text))
        .withColumn("html", F.lit(donor_text))
        .select(*pages.columns)
    )
    process_micro_batch(bridge, 0, root, "s1", buckets=BUCKETS)

    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2["assignment"] == "composed"
    assert s2["parts_reshingled"] == 1

    # the old cluster's docs now carry the bridge url as canonical
    assign = sinks.read_table(spark, root, "canon_assignment")
    relabeled = assign.where(F.col("canonical_id") == bridge_url).count()
    assert relabeled >= ent["n_members"] + 1

    root2 = str(tmp_path_factory.mktemp("merge_scratch"))
    pipeline.run(
        spark, pages.unionByName(bridge), root2, "rA", buckets=BUCKETS
    )
    assert _canon_snapshot(spark, root) == _canon_snapshot(spark, root2)
    pages.unpersist()


def test_deletion_falls_back_to_full_assignment(spark, tmp_path_factory):
    """Deletions can SPLIT components — the additive gate must reject
    them and take the general recompute."""
    root = str(tmp_path_factory.mktemp("nonadd"))
    pages = generate_pages(
        spark, 150, near_dup_fraction=0.25, include_reference_eml=False
    ).cache()
    pipeline.run(spark, pages, root, "r1", buckets=BUCKETS)
    victim = pages.select("url").first()["url"]
    pipeline.delete_pages(spark, root, [victim], "del1", buckets=BUCKETS)
    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2["delta"] is True
    assert s2["assignment"] == "full"
    root2 = str(tmp_path_factory.mktemp("nonadd_scratch"))
    pipeline.run(
        spark,
        pages.where(F.col("url") != victim),
        root2,
        "rA",
        buckets=BUCKETS,
    )
    assert _canon_snapshot(spark, root) == _canon_snapshot(spark, root2)
    pages.unpersist()
