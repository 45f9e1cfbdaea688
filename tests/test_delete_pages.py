"""Targeted page deletion (right-to-be-forgotten): removing urls must
rewrite ONLY the url-hash partitions they live in, leave every other
part's state token untouched, and let the next incremental
canonicalize run heal the derived tables to exactly the state a
from-scratch build over the reduced corpus produces."""

from __future__ import annotations

import os

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
        ("entities", ["canonical_id", "n_members"]),
        ("triples_canonical", ["subj", "pred_id", "obj_id"]),
    ]:
        if pipeline._partition_ids(root, tbl):
            rows = sinks.read_table(spark, root, tbl).select(*cols).collect()
            out[tbl] = sorted(tuple(r) for r in rows)
        else:
            out[tbl] = []
    return out


def _part_of(url: str, spark) -> int:
    return (
        spark.range(1)
        .select(
            F.pmod(F.xxhash64(F.lit(url)), F.lit(BUCKETS))
            .cast("int")
            .alias("p")
        )
        .first()["p"]
    )


def test_delete_rewrites_only_hit_parts_and_delta_heals(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("del"))
    pages = generate_pages(
        spark, 300, near_dup_fraction=0.25, include_reference_eml=False
    ).cache()
    pipeline.run(spark, pages, root, "r1", buckets=BUCKETS)

    # delete a near-dup cluster member (it has edges) plus one more url
    edge_url = sinks.read_table(spark, root, "edges").first()["id_a"]
    other_url = (
        pages.where(F.col("url") != edge_url).select("url").first()["url"]
    )
    victims = [edge_url, other_url]
    victim_parts = {_part_of(u, spark) for u in victims}

    tokens_before = sinks.pages_state_tokens(spark, root, "pages_text")
    stats = pipeline.delete_pages(spark, root, victims, "del1", buckets=BUCKETS)
    assert stats["rows_deleted"]["pages_text"] == 2
    assert stats["rows_deleted"]["triples"] > 0
    assert set(stats["parts_rewritten"]["pages_text"]) == victim_parts

    # untouched parts keep their state tokens; hit parts move
    tokens_after = sinks.pages_state_tokens(spark, root, "pages_text")
    for p, tok in tokens_before.items():
        if p in victim_parts:
            assert tokens_after[p] != tok
        else:
            assert tokens_after[p] == tok

    # the durable tables no longer know the urls
    pt = sinks.read_durable(spark, root, "pages_text")
    assert pt.where(F.col("url").isin(victims)).count() == 0
    tr = sinks.read_durable(spark, root, "triples")
    assert tr.where(F.col("subj").isin(victims)).count() == 0

    # incremental heal: only the hit parts re-shingle
    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2["delta"] is True
    assert s2["parts_reshingled"] == len(victim_parts)

    # equality with a from-scratch build over the reduced corpus
    root2 = str(tmp_path_factory.mktemp("del_scratch"))
    pipeline.run(
        spark,
        pages.where(~F.col("url").isin(victims)),
        root2,
        "rA",
        buckets=BUCKETS,
    )
    assert _canon_snapshot(spark, root) == _canon_snapshot(spark, root2)
    pages.unpersist()


def test_delete_streamed_url_preserves_exactly_once_view(
    spark, tmp_path_factory
):
    root = str(tmp_path_factory.mktemp("del_stream"))
    pages = generate_pages(
        spark, 200, near_dup_fraction=0.2, include_reference_eml=False
    ).cache()
    pipeline.run(spark, pages, root, "r1", buckets=BUCKETS)
    streamed = generate_pages(
        spark, 230, near_dup_fraction=0.2, include_reference_eml=False
    ).where(F.col("page_id") >= 200)
    process_micro_batch(streamed, 0, root, "s1", buckets=BUCKETS)

    s_url = streamed.select("url").first()["url"]
    b_url = pages.select("url").first()["url"]
    pipeline.delete_pages(spark, root, [s_url, b_url], "del1", buckets=BUCKETS)

    pt = sinks.read_durable(spark, root, "pages_text")
    assert pt.where(F.col("url").isin([s_url, b_url])).count() == 0
    # surviving streamed rows are still visible exactly once
    n_streamed_left = pt.join(
        streamed.select("url"), "url", "left_semi"
    ).count()
    assert n_streamed_left == streamed.count() - 1

    pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    root2 = str(tmp_path_factory.mktemp("del_stream_scratch"))
    survivors = (
        pages.unionByName(streamed)
        .where(~F.col("url").isin([s_url, b_url]))
    )
    pipeline.run(spark, survivors, root2, "rA", buckets=BUCKETS)
    assert _canon_snapshot(spark, root) == _canon_snapshot(spark, root2)
    pages.unpersist()


def test_delete_emptied_part_defeats_short_circuit_and_heals(
    spark, tmp_path_factory
):
    """Emptying a partition removes it from disk entirely — the delta
    diff must treat the vanished part as changed (disk ∪ snapshot),
    not short-circuit over stale canonical outputs."""
    root = str(tmp_path_factory.mktemp("del_empty"))
    pages = generate_pages(
        spark, 200, near_dup_fraction=0.25, include_reference_eml=False
    ).cache()
    pipeline.run(spark, pages, root, "r1", buckets=BUCKETS)

    part = int(pipeline._partition_ids(root, "pages_text")[0])
    victims = [
        r["url"]
        for r in pages.where(
            F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int") == part
        )
        .select("url")
        .collect()
    ]
    assert victims
    stats = pipeline.delete_pages(spark, root, victims, "del1", buckets=BUCKETS)
    assert part in stats["parts_emptied"]["pages_text"]
    assert not os.path.isdir(
        os.path.join(root, "pages_text", f"part_id={part}")
    )

    # the healing run must NOT take the zero-change short-circuit
    s2 = pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)
    assert s2["delta"] is True and not s2.get("short_circuit")
    assert s2["parts_reshingled"] >= 1

    root2 = str(tmp_path_factory.mktemp("del_empty_scratch"))
    pipeline.run(
        spark,
        pages.where(~F.col("url").isin(victims)),
        root2,
        "rA",
        buckets=BUCKETS,
    )
    assert _canon_snapshot(spark, root) == _canon_snapshot(spark, root2)

    # once healed, the ghost part drops out of the snapshot and a
    # no-change rerun short-circuits again
    s3 = pipeline.run_canonicalize_phase(spark, root, "c3", buckets=BUCKETS)
    assert s3.get("short_circuit") is True
    pages.unpersist()


def test_delete_emptied_part_purges_doc_state(spark, tmp_path_factory):
    """ADVICE r5 (medium): emptying a whole pages_text part must not
    leave its docs behind in the doc-keyed state tables — the heal
    run's dynamic state writes have zero rows for the vanished part,
    so without the explicit ghost-part cleanup the rows would sit
    there forever and a later composed run could resurrect the
    deleted urls into entities/assignment (an RTBF leak)."""
    root = str(tmp_path_factory.mktemp("del_state"))
    pages = generate_pages(
        spark, 204, near_dup_fraction=0.25, include_reference_eml=False
    ).cache()
    base = pages.where(F.col("page_id") < 200)
    pipeline.run(spark, base, root, "r1", buckets=BUCKETS)

    part = int(pipeline._partition_ids(root, "pages_text")[0])
    victims = [
        r["url"]
        for r in base.where(
            F.pmod(F.xxhash64("url"), F.lit(BUCKETS)).cast("int") == part
        )
        .select("url")
        .collect()
    ]
    assert victims
    pipeline.delete_pages(spark, root, victims, "del1", buckets=BUCKETS)
    pipeline.run_canonicalize_phase(spark, root, "c2", buckets=BUCKETS)

    for tbl in ("canon_signatures", "canon_assignment", "canon_doc_hash"):
        assert not os.path.isdir(
            os.path.join(root, tbl, f"part_id={part}")
        ), tbl
    assign = sinks.read_table(spark, root, "canon_assignment")
    assert assign.where(F.col("doc_id").isin(victims)).count() == 0

    # an additive increment afterwards must keep the purge: no deleted
    # url may reappear in assignment or entity member lists
    new_pages = pages.where(F.col("page_id") >= 200)
    process_micro_batch(new_pages, 0, root, "s1", buckets=BUCKETS)
    pipeline.run_canonicalize_phase(spark, root, "c3", buckets=BUCKETS)
    assign = sinks.read_table(spark, root, "canon_assignment")
    assert assign.where(F.col("doc_id").isin(victims)).count() == 0
    ents = sinks.read_table(spark, root, "entities")
    resurrected = ents.where(
        F.size(F.array_intersect(F.col("members"), F.array(*[F.lit(v) for v in victims]))) > 0
    ).count()
    assert resurrected == 0
    pages.unpersist()


def test_delete_bucket_mismatch_raises(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("del_mismatch"))
    pages = generate_pages(
        spark, 60, near_dup_fraction=0.0, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "r1", buckets=BUCKETS)
    url = pages.select("url").first()["url"]
    with pytest.raises(ValueError, match="buckets"):
        pipeline.delete_pages(spark, root, [url], "del1", buckets=BUCKETS * 2)


def test_delete_unknown_urls_rewrites_nothing_but_flips_target_tokens(
    spark, tmp_path_factory
):
    """A deletion finding no hits rewrites NO data files — but it must
    still commit (= flip the state token of) every on-disk TARGET
    part: that is what makes a deletion re-runnable after a crash
    between the partition rewrites and the manifest append (ADVICE
    r5, medium — with the old no-op behavior the re-run found 0 hits,
    committed nothing, and the stale derived tables could never heal).
    Non-target parts' tokens stay untouched."""
    root = str(tmp_path_factory.mktemp("del_noop"))
    pages = generate_pages(
        spark, 60, near_dup_fraction=0.0, include_reference_eml=False
    )
    pipeline.run_extract_phase(spark, pages, root, "r1", buckets=BUCKETS)
    tokens_before = sinks.pages_state_tokens(spark, root, "pages_text")
    files_before = {
        p: sorted(
            os.listdir(os.path.join(root, "pages_text", f"part_id={p}"))
        )
        for p in pipeline._partition_ids(root, "pages_text")
    }
    unknown = "https://nowhere.example/x"
    target = _part_of(unknown, spark)
    stats = pipeline.delete_pages(
        spark, root, [unknown], "del1", buckets=BUCKETS
    )
    assert stats["rows_deleted"] == {"pages_text": 0, "triples": 0}
    assert stats["parts_rewritten"] == {"pages_text": [], "triples": []}
    # no data file moved anywhere
    files_after = {
        p: sorted(
            os.listdir(os.path.join(root, "pages_text", f"part_id={p}"))
        )
        for p in pipeline._partition_ids(root, "pages_text")
    }
    assert files_after == files_before
    tokens_after = sinks.pages_state_tokens(spark, root, "pages_text")
    for p, tok in tokens_before.items():
        if p == target:
            assert tokens_after[p] != tok
        else:
            assert tokens_after[p] == tok
