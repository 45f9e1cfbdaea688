"""End-to-end KG construction pipeline over a pages corpus.

pages(url, warc_ts, html, text, lang)
  → [extract] fill missing text from html (Arrow pandas UDF, U1)
  → [detect]  dictionary-trie mention scan (U2/U3) → explode
  → [link]    broadcast join to vocabulary (J1)
  → [emit]    (subj, pred, obj) triples + det_id + part_id
  → [write]   partitioned parquet + _manifest + _lineage (S8/S6)
  → [canonicalize] MinHash-LSH → verify → CC → entities/edges +
                   canonical triples (separate whole-corpus phase)

Scale shape: stages extract→detect→link are narrow + broadcast (zero
corpus shuffles; one fused Python crossing per stage group); the
first shuffles are the final partitioned write and the
canonicalization joins, exactly as budgeted in SURVEY.md §4.3.

Resume: the checkpoint unit is ``part_id = pmod(xxhash64(url), B)``.
A partition is durable iff its _manifest row exists; reruns anti-join
committed parts (J5) and rewrite only the rest — idempotent because
every id is deterministic (P6) and writes are dynamic-partition
overwrites.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spinneret_spark.extract.htmltext import extract_text
from spinneret_spark.functions.hashing import det_id
from spinneret_spark.operators.canonicalize import (
    canonical_entities,
    entity_table,
    near_dup_edges,
    rewrite_triples,
)
from spinneret_spark.operators.linking import MENTIONS_PRED, MENTIONS_PRED_LABEL
from spinneret_spark.operators.mentions import detect_mentions_trie
from spinneret_spark.sinks import tables as sinks
from spinneret_spark.sources.vocab import DEFAULT_TERMS, VOCAB_URI_PREFIX

DEFAULT_BUCKETS = 32


def with_part_id(pages: DataFrame, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return pages.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int")
    )


def fill_text(pages: DataFrame) -> DataFrame:
    """U1: deterministic HTML→text where the crawl didn't supply it."""

    @F.pandas_udf("string")
    def extract(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for htmls in batches:
            yield htmls.map(
                lambda b: extract_text(bytes(b)) if b is not None else ""
            )

    return pages.withColumn(
        "text",
        F.when(
            F.col("text").isNull() | (F.col("text") == ""), extract(F.col("html"))
        ).otherwise(F.col("text")),
    )


def pages_to_triples(
    pages: DataFrame, terms: list[str] | None = None
) -> DataFrame:
    """detect → link → emit. Keeps part_id/url provenance columns."""
    terms = terms or DEFAULT_TERMS
    with_mentions = detect_mentions_trie(pages, terms)
    m = with_mentions.select(
        "part_id",
        "url",
        "lang",
        F.explode("mentions").alias("m"),
    ).select("part_id", "url", "lang", "m.norm", "m.start", "m.end")
    # dictionary ids resolve by construction (terms ⊂ vocab); a real
    # vocabulary joins here instead (linking.link_mentions)
    subj = F.col("url")
    return (
        m.select(
            "part_id",
            subj.alias("subj"),
            F.lit(MENTIONS_PRED_LABEL).alias("pred"),
            F.col("norm").alias("obj"),
            F.lit(MENTIONS_PRED).alias("pred_id"),
            F.concat(F.lit(VOCAB_URI_PREFIX), F.col("norm")).alias("obj_id"),
            "lang",
        )
        .distinct()
        .withColumn(
            "det_id", det_id(F.col("subj"), F.col("pred_id"), F.col("obj_id"))
        )
    )


def run_extract_phase(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    run_id: str,
    buckets: int = DEFAULT_BUCKETS,
    terms: list[str] | None = None,
) -> dict:
    """Resumable per-partition phase: pages → triples table."""
    t0 = time.time()
    pages = with_part_id(pages, buckets)
    done = sinks.committed_parts(spark, out_root, "triples")
    todo = pages.join(F.broadcast(done), "part_id", "left_anti")
    triples = pages_to_triples(fill_text(todo), terms)

    sinks.write_partitioned(triples, out_root, "triples")

    written = sinks.read_table(spark, out_root, "triples")
    part_counts = (
        written.join(F.broadcast(done), "part_id", "left_anti")
        .groupBy("part_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    new_parts = [(r["part_id"], r["n"]) for r in part_counts]
    if new_parts:
        sinks.append_manifest(spark, out_root, run_id, "triples", new_parts)
        metrics = spark.createDataFrame(
            [
                (p, "extract_link", "rows_out", float(n))
                for p, n in new_parts
            ],
            "part_id int, stage string, metric string, value double",
        )
        sinks.append_lineage(spark, out_root, run_id, "triples", metrics)
    return {
        "run_id": run_id,
        "parts_written": len(new_parts),
        "rows_written": sum(n for _, n in new_parts),
        "seconds": time.time() - t0,
    }


def run_canonicalize_phase(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    run_id: str,
    jaccard_threshold: float = 0.8,
    buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """Whole-corpus phase: near-dup edges → entities → canonical
    triples. Runs over the committed triples table + pages text."""
    t0 = time.time()
    docs = with_part_id(fill_text(pages), buckets).select(
        F.col("url").alias("doc_id"), "text"
    )
    edges = near_dup_edges(docs, jaccard_threshold, id_col="doc_id")
    assignment = canonical_entities(docs, edges, id_col="doc_id")

    triples = sinks.read_committed(spark, out_root, "triples")
    canon = rewrite_triples(
        triples.withColumn("subj", F.col("subj")),
        assignment.select(
            F.col("doc_id"), F.col("canonical_id")
        ),
        subj_prefix="",
        id_col="doc_id",
    )

    edges_out = edges.withColumn(
        "part_id", F.pmod(F.xxhash64("id_a"), F.lit(buckets)).cast("int")
    )
    sinks.write_partitioned(edges_out, out_root, "edges")
    ents = entity_table(assignment, id_col="doc_id").withColumn(
        "part_id", F.pmod(F.xxhash64("canonical_id"), F.lit(buckets)).cast("int")
    )
    sinks.write_partitioned(ents, out_root, "entities")
    canon_out = canon.withColumn(
        "part_id", F.pmod(F.xxhash64("subj"), F.lit(buckets)).cast("int")
    )
    sinks.write_partitioned(canon_out, out_root, "triples_canonical")

    n_entities = ents.count()
    n_edges = edges_out.count()
    n_triples = canon_out.count()
    for tbl, n in [
        ("edges", n_edges),
        ("entities", n_entities),
        ("triples_canonical", n_triples),
    ]:
        parts = (
            sinks.read_table(spark, out_root, tbl)
            .select("part_id")
            .distinct()
            .collect()
        )
        sinks.append_manifest(
            spark, out_root, run_id, tbl, [(r["part_id"], -1) for r in parts]
        )
    return {
        "run_id": run_id,
        "n_entities": n_entities,
        "n_edges": n_edges,
        "n_canonical_triples": n_triples,
        "seconds": time.time() - t0,
    }


def run(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    run_id: str,
    buckets: int = DEFAULT_BUCKETS,
    canonicalize: bool = True,
    terms: list[str] | None = None,
) -> dict:
    stats = run_extract_phase(spark, pages, out_root, run_id, buckets, terms)
    if canonicalize:
        stats["canonicalize"] = run_canonicalize_phase(
            spark, pages, out_root, run_id, buckets=buckets
        )
    return stats
