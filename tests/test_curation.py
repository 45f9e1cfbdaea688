"""Curation-operator tests: deterministic sampling invariants, the
two-phase distributed prefix sum against a single-window reference,
and the plan contracts (no global corpus window; TakeOrdered top-k).
Oracle twins live in __spark_entry__ (curate_* / vocab_topk_tokens)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from spinneret_spark.operators.curation import (
    deterministic_sample,
    pack_sequences,
    vocab_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    # unpersist on teardown: a cached raw scan of this path would be
    # substituted into OTHER test modules' plans by the cache manager,
    # erasing their PushedFilters (bit test_plans once)
    df = spark.read.parquet(f"{SF}/documents.parquet").cache()
    yield df
    df.unpersist()


def test_sample_is_deterministic_and_nested(spark, docs):
    """Same fraction → same rows on every run; smaller fraction →
    subset of the larger one (threshold gates nest by construction,
    the property that makes ramped sampling reproducible)."""
    a = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.3).collect()}
    assert a == b
    small = {
        r["doc_id"] for r in deterministic_sample(docs, "doc_id", 0.1).collect()
    }
    assert small <= a
    assert deterministic_sample(docs, "doc_id", 0.0).count() == 0
    assert deterministic_sample(docs, "doc_id", 1.0).count() == docs.count()


def test_sample_stratified_rates(spark, docs):
    """Per-stratum fractions land near their targets (md5-uniform)."""
    out = deterministic_sample(
        docs, "doc_id", 0.5, strata_col="lang", strata_fractions={"en": 0.2}
    )
    rates = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    en_rate = rates.get("en", 0) / totals["en"]
    rest_rate = sum(v for k, v in rates.items() if k != "en") / sum(
        v for k, v in totals.items() if k != "en"
    )
    assert 0.08 <= en_rate <= 0.32, en_rate
    assert 0.38 <= rest_rate <= 0.62, rest_rate


def test_pack_matches_single_window_reference(spark, docs):
    """The two-phase prefix sum must equal the naive global window on
    a shuffled input — the result is a function of (id, cost) only,
    never of the incoming partition layout."""
    shuffled = docs.repartition(13)  # destroy any incidental order
    got = {
        r["doc_id"]: (r["start_off"], r["chunk_id"], r["n_chunks"])
        for r in pack_sequences(
            shuffled, budget=2048, cost_col="n_chars", num_parts=7
        ).collect()
    }
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    ref = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("cost"),
        F.coalesce(F.sum("n_chars").over(w), F.lit(0))
        .cast("long")
        .alias("start_off"),
    )
    for r in ref.collect():
        start, cost = r["start_off"], r["cost"]
        chunk = start // 2048
        end = (start + max(cost, 1) - 1) // 2048
        assert got[r["doc_id"]] == (start, chunk, end - chunk + 1)


def test_pack_covers_budget_exactly(spark, docs):
    """Chunks partition the concatenated corpus: total cost equals the
    last document's start+cost, and every chunk id in [0, last] is
    occupied (concat-and-chunk leaves no hole)."""
    out = pack_sequences(docs, budget=2048, cost_col="n_chars").cache()
    total = docs.agg(F.sum("n_chars")).first()[0]
    last = out.orderBy(F.desc("start_off")).first()
    assert last["start_off"] + last["cost"] == total
    seen = {
        r["chunk_id"]
        for r in out.select(
            F.explode(
                F.sequence(
                    "chunk_id", F.col("chunk_id") + F.col("n_chunks") - 1
                )
            ).alias("chunk_id")
        ).collect()
    }
    assert seen == set(range((total - 1) // 2048 + 1))
    out.unpersist()


def test_pack_plan_has_no_global_corpus_window(spark, docs):
    """Exactly two Window nodes: the corpus-side one partitioned by
    _pid (parallel), the offsets one over #partitions rows (tiny).
    A Window with an empty partition spec consuming the corpus scan
    would serialize the whole table through one task."""
    out = pack_sequences(docs, budget=2048, cost_col="n_chars", num_parts=7)
    plan = out._jdf.queryExecution().executedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert len(specs) == 2, plan
    # a partitioned spec lists partition columns before the ordering
    # expression ("_pid#31, doc_id#0L ASC ..."); an unpartitioned one
    # starts directly with the ordered column ("_pid#170 ASC ...")
    partitioned = [s for s in specs if "," in s.split(" ASC")[0]]
    assert len(partitioned) == 1, specs
    assert "_pid" in partitioned[0].split(",")[0], specs


def test_vocab_topk_uses_partial_topk_not_global_sort(spark, docs):
    out = vocab_topk(docs, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    rows = out.collect()
    assert len(rows) <= 10
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_sample_null_stratum_gets_default_rate(spark):
    """A NULL stratum value must fall through to the default fraction
    (SQL CASE semantics, matching the DuckDB oracle) — not be silently
    dropped by three-valued logic."""
    rows = [(i, None if i % 2 else "en") for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = deterministic_sample(
        df, "doc_id", 1.0, strata_col="lang", strata_fractions={"en": 0.0}
    )
    kept = out.collect()
    assert all(r["lang"] is None for r in kept)
    assert len(kept) == 200  # every null-stratum row kept at 1.0
