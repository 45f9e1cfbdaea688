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

import os
import shutil
import time
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spinneret_spark.extract.htmltext import extract_text
from spinneret_spark.functions.hashing import det_id
from spinneret_spark.materialize import materialize
from spinneret_spark.operators.canonicalize import (
    canonical_entities,
    dedup_canonical_triples,
    entity_table,
    near_dup_edges,
    rewrite_triples,
    rewrite_triples_raw,
    verify_candidate_pairs,
)
from spinneret_spark.operators.linking import MENTIONS_PRED, MENTIONS_PRED_LABEL
from spinneret_spark.sinks import tables as sinks
from spinneret_spark.sources.vocab import DEFAULT_TERMS, VOCAB_URI_PREFIX

DEFAULT_BUCKETS = 32


def _partition_ids(out_root: str, table_name: str) -> list[int]:
    """part_ids present on disk, from the ``part_id=`` directory names
    alone — a filesystem listing, no Spark job, no data read (the
    Iceberg path reads the same thing from table metadata)."""
    import os

    path = os.path.join(out_root, table_name)
    try:
        names = os.listdir(path)
    except OSError:
        return []
    out = []
    for name in names:
        if name.startswith("part_id="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                pass
    return sorted(out)


def with_part_id(pages: DataFrame, buckets: int = DEFAULT_BUCKETS) -> DataFrame:
    return pages.withColumn(
        "part_id", F.pmod(F.xxhash64("url"), F.lit(buckets)).cast("int")
    )


def fill_text(pages: DataFrame) -> DataFrame:
    """U1: deterministic HTML→text where the crawl didn't supply it.

    Split plan instead of a probe scan: rows that already have text
    pass through a filter branch that never reads ``html`` (column
    pruning reaches the scan) and never crosses into Python; only the
    missing-text rows ship their html through the Arrow UDF. On a
    fully-extracted corpus the UDF branch is an empty filtered scan —
    no data probe, no wasted Arrow bytes — and on a raw crawl the
    pass-through branch is the empty one. Exactly one ArrowEvalPython
    node either way (asserted in tests/test_plans.py).
    """
    is_missing = F.col("text").isNull() | (F.col("text") == "")

    @F.pandas_udf("string")
    def fill(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        for htmls in batches:
            yield pd.Series(
                [
                    extract_text(bytes(h)) if h is not None else ""
                    for h in htmls
                ]
            )

    present = pages.where(~is_missing)
    missing = pages.where(is_missing).withColumn("text", fill(F.col("html")))
    return present.unionByName(missing)


_MENTION_ROWS_SCHEMA = (
    "part_id int, url string, lang string, norm string"
)


def _fused_extract_detect(
    pages: DataFrame, terms: list[str], assume_text: bool | None = None
) -> DataFrame:
    """U1+U2 fused: HTML→text + dictionary mention scan in ONE
    mapInPandas (one Arrow crossing for the whole hot path —
    SURVEY.md §3.1). The flatMap (one page → N mentions) happens
    inside the kernel, so no explode/Generate node is needed either.
    DictMatcher keeps per-token cost dictionary-size-independent
    (operators/mentions.py).

    Mentions are deduped PER PAGE inside the kernel: a page's
    occurrences all live in its own input row, so document-level
    distinctness never needs a cluster-wide shuffle — this is the
    difference between shuffling every occurrence (~40/page) and
    shuffling nothing. Offset-level mentions come from
    operators.mentions.detect_mentions_trie when needed.
    """
    from spinneret_spark.operators.mentions import DictMatcher

    # html is the fat column; ship it through Arrow only when some row
    # may need extraction. ``assume_text=True`` is MANIFEST-LEVEL
    # state, not a data probe: run_extract_phase reads the just-
    # written pages_text table, whose rows are filled by construction
    # — the caller asserts it instead of paying a corpus scan to
    # discover it. ``assume_text=None`` (direct callers) falls back to
    # a limit-1 probe.
    if assume_text is None:
        assume_text = "html" not in pages.columns or (
            pages.where(F.col("text").isNull() | (F.col("text") == ""))
            .limit(1)
            .count()
            == 0
        )
    need_html = "html" in pages.columns and not assume_text
    cols = ["part_id", "url", "lang", "text"] + (["html"] if need_html else [])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = DictMatcher(terms)  # built once per worker
        for pdf in batches:
            htmls = pdf["html"] if need_html else pdf["url"]  # dummy align
            parts, urls, langs, norms = [], [], [], []
            for part, url, lang, text, html in zip(
                pdf["part_id"], pdf["url"], pdf["lang"], pdf["text"], htmls
            ):
                if not text:
                    text = (
                        extract_text(bytes(html))
                        if need_html and html is not None
                        else ""
                    )
                for norm in sorted(matcher.find_norms(text)):
                    parts.append(part)
                    urls.append(url)
                    langs.append(lang)
                    norms.append(norm)
            yield pd.DataFrame(
                {
                    "part_id": pd.array(parts, dtype="int32"),
                    "url": urls,
                    "lang": langs,
                    "norm": norms,
                }
            )

    return pages.select(*cols).mapInPandas(kernel, schema=_MENTION_ROWS_SCHEMA)


_PAGES_TEXT_SCHEMA = (
    "part_id int, url string, lang string, text string, norms array<string>"
)


def _fused_extract_detect_full(
    pages: DataFrame, terms: list[str], assume_text: bool | None = None
) -> DataFrame:
    """The ONE-crossing phase kernel: html → (text, sorted distinct
    norms) per page, one output row per page.

    This is the shape that lets the extract phase materialize BOTH the
    pages_text table and (after a JVM-side explode) the triples table
    from a single Python pass — the round-1 layout shipped text
    through Arrow twice (extract out, detect in), doubling the
    Python-bound bytes of the dominant stage.
    """
    from spinneret_spark.operators.mentions import DictMatcher

    if assume_text is None:
        assume_text = "html" not in pages.columns or (
            pages.where(F.col("text").isNull() | (F.col("text") == ""))
            .limit(1)
            .count()
            == 0
        )
    need_html = "html" in pages.columns and not assume_text
    cols = ["part_id", "url", "lang", "text"] + (["html"] if need_html else [])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        matcher = DictMatcher(terms)  # built once per worker
        for pdf in batches:
            htmls = pdf["html"] if need_html else pdf["url"]  # dummy align
            texts, norms = [], []
            for text, html in zip(pdf["text"], htmls):
                if not text:
                    text = (
                        extract_text(bytes(html))
                        if need_html and html is not None
                        else ""
                    )
                texts.append(text)
                norms.append(sorted(matcher.find_norms(text)))
            yield pd.DataFrame(
                {
                    "part_id": pdf["part_id"],
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "text": texts,
                    "norms": norms,
                }
            )

    return pages.select(*cols).mapInPandas(kernel, schema=_PAGES_TEXT_SCHEMA)


def _triples_projection(m: DataFrame) -> DataFrame:
    """(part_id, url, lang, norm) mention rows → triple rows with
    deterministic ids. Pure built-ins — never crosses into Python."""
    subj = F.col("url")
    return m.select(
        "part_id",
        subj.alias("subj"),
        F.lit(MENTIONS_PRED_LABEL).alias("pred"),
        F.col("norm").alias("obj"),
        F.lit(MENTIONS_PRED).alias("pred_id"),
        F.concat(F.lit(VOCAB_URI_PREFIX), F.col("norm")).alias("obj_id"),
        "lang",
    ).withColumn(
        "det_id", det_id(F.col("subj"), F.col("pred_id"), F.col("obj_id"))
    )


def pages_to_triples(
    pages: DataFrame,
    terms: list[str] | None = None,
    assume_text: bool | None = None,
) -> DataFrame:
    """extract+detect (fused, one Python crossing) → link → emit.

    Expects ``part_id`` present (``with_part_id``); ``text`` may be
    empty/null — the fused kernel extracts from html on the fly.
    No shuffle anywhere in this plan: per-page dedup happens in the
    kernel, and rows are already distinct by (subj, obj) because a
    subj IS its page's url.
    """
    terms = terms or DEFAULT_TERMS
    m = _fused_extract_detect(pages, terms, assume_text)
    # dictionary ids resolve by construction (terms ⊂ vocab); a real
    # vocabulary joins here instead (linking.link_mentions)
    return _triples_projection(m)


def run_extract_phase(
    spark: SparkSession,
    pages: DataFrame,
    out_root: str,
    run_id: str,
    buckets: int = DEFAULT_BUCKETS,
    terms: list[str] | None = None,
) -> dict:
    """Resumable per-partition phase: pages → pages_text + triples.

    Extraction is materialized ONCE as the ``pages_text`` table
    (part_id, url, lang, text): HTML parsing is the expensive Python
    pass, and every downstream consumer (mention scan here,
    canonicalization's shingling, any future stage) reads the text
    table instead of re-extracting — at 10^12 documents re-running
    extraction per consumer would dwarf everything else in the job.
    """
    t0 = time.time()
    pages = with_part_id(pages, buckets)
    # ONE manifest read serves both resume inputs (part ids + bucket
    # meta); the anti-join side rebuilds as a local DataFrame — no
    # second scan, and the broadcast below ships the tiny id list
    done_ids, prior_buckets = sinks.resume_state(spark, out_root, "triples")
    done = spark.createDataFrame(
        [(int(p),) for p in sorted(done_ids)], "part_id int"
    )
    # part_id = pmod(xxhash64(url), buckets): manifest commits are only
    # meaningful under the bucket count that produced them. A recorded
    # mismatch means every resume decision below would be wrong — fail
    # loudly instead of silently skipping unprocessed pages.
    if prior_buckets and prior_buckets != {buckets}:
        raise ValueError(
            f"manifest at {out_root} was committed with "
            f"buckets={sorted(prior_buckets)}; this run uses "
            f"buckets={buckets} — part_id mappings differ; rerun with "
            "the original bucket count or start a fresh out_root"
        )
    if len(done_ids) >= buckets and prior_buckets == {buckets}:
        # manifest-level short-circuit: part_id can only take `buckets`
        # values, every one is committed, AND the recorded bucket count
        # matches — a fully-extracted resume run touches NO data files
        # and runs ZERO corpus jobs (tests/test_pipeline_resume.py).
        # Without a recorded count (legacy manifest) we fall through to
        # the anti-join, which is correct under the match we can't prove.
        return {
            "run_id": run_id,
            "parts_written": 0,
            "rows_written": 0,
            "seconds": time.time() - t0,
        }
    todo = pages.join(F.broadcast(done), "part_id", "left_anti")

    # Interleave guard (round-3 ADVICE, high): dynamic overwrite
    # rewrites every part this run produces rows for — WHOLESALE,
    # streamed appends included. A page that arrived only via streaming
    # would be destroyed without replacement if the batch input doesn't
    # cover it, so when markers exist, verify coverage of the
    # marker-valid streamed pages in the parts this run will rewrite
    # and fail loudly on a gap. (Runs zero extra jobs on a never-
    # streamed root: the marker check is one manifest read. A streamed
    # page with zero mentions left no durable record at all, so only
    # pages with streamed rows are checkable — documented limit.)
    mm = sinks.stream_marker_map(spark, out_root, ["pages_text", "triples"])
    pt_markers, markers = mm["pages_text"], mm["triples"]

    def _tagged_pages(tbl: str, marker_set: set[str], url_col: str):
        """Marker-valid streamed (part_id, url) pairs — or None when
        no tagged file survives: after a covering batch overwrite
        deletes every streamed file, the append-only markers outlive
        the tag COLUMN itself, and an unguarded column reference would
        brick every future batch run (round-4 review)."""
        if not (marker_set and _partition_ids(out_root, tbl)):
            return None
        data = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(out_root, tbl)
        )
        if "_batch_run" not in data.columns:
            return None
        return (
            data.where(F.col("_batch_run").isin(sorted(marker_set)))
            .select("part_id", F.col(url_col).alias("url"))
            .distinct()
        )

    # UNION both sources (round-4 ADVICE): streamed pages_text is the
    # complete record for round-4+ attempts (zero-mention pages appear
    # there but never create a triples partition dir), while legacy
    # attempts tagged only triples rows — a root holding both kinds
    # must cover both, or surviving pages_text tags would make the
    # guard ignore the legacy streamed pages entirely and let a batch
    # overwrite destroy them without the intended loud failure
    from_pages = _tagged_pages("pages_text", pt_markers, "url")
    from_triples = _tagged_pages("triples", markers, "subj")
    if from_pages is not None and from_triples is not None:
        streamed_pages = from_pages.unionByName(from_triples).distinct()
    else:
        streamed_pages = from_pages if from_pages is not None else from_triples
    if streamed_pages is not None:
        batch_urls = todo.select("part_id", "url")
        # a streamed page is at risk iff (a) the batch input misses it
        # AND (b) the batch rewrites its part (= input has rows there)
        lost = (
            streamed_pages.join(batch_urls, ["part_id", "url"], "left_anti")
            .join(
                batch_urls.select("part_id").distinct(),
                "part_id",
                "left_semi",
            )
            .head(5)
        )
        if lost:
            sample = ", ".join(r["url"] for r in lost)
            raise ValueError(
                "batch run would overwrite parts holding streamed pages "
                f"its input does not cover (e.g. {sample}); rerun with a "
                "batch input that includes the streamed pages, or vacuum/"
                "reprocess the streamed appends first"
            )

    # ONE Python crossing for the whole phase: extract + detect fused,
    # pages_text materialized WITH the per-page norms array, and the
    # triples table derived from the durable pages_text by a pure-JVM
    # explode — html and text each cross the Arrow boundary exactly
    # once per page, ever
    enriched = _fused_extract_detect_full(todo, terms or DEFAULT_TERMS)
    sinks.write_partitioned(enriched, out_root, "pages_text", shuffle=False)
    # BATCH rows only: on a root streaming has appended to, the raw
    # pages_text read would pull streamed rows from parts this run
    # never rewrote into THIS batch's triples derivation (duplicating
    # them into an overwrite) — the tag filter keeps the derivation
    # scoped to what this phase's writes actually own
    text_tbl = sinks.read_table_batch_rows(
        spark, out_root, "pages_text", enriched.schema
    ).join(F.broadcast(done), "part_id", "left_anti")
    mentions = text_tbl.select(
        "part_id", "url", "lang", F.explode("norms").alias("norm")
    )
    triples = _triples_projection(mentions)

    # no repartition: the plan upstream is shuffle-free, and pages
    # corpora are bucketed by part_id on disk (corpusgen.write_pages),
    # so tasks already align with output partitions
    sinks.write_partitioned(triples, out_root, "triples", shuffle=False)

    # commit accounting from the durable files (cheap: parquet scan of
    # just-written partitions, pruned to part_id — column-pruned to the
    # partition column, so it reads footers, not data). BOTH tables are
    # counted in ONE tagged-union job (the canonicalize pattern): the
    # pages_text rows_out manifest rows are what later phases (curation
    # n_in) read instead of re-counting the corpus. A corpus where NO
    # page yields a mention writes an empty table (no partition dirs,
    # no readable schema) — the directory listing guards that case.
    # The read filters to BATCH rows (explicit schema + tag-null
    # predicate — no schema-merge job): leftover streamed appends and
    # crashed-attempt orphans in parts this run did NOT rewrite must
    # never be counted into a part's "committed" row, or a later
    # resume anti-joins that part away and skips its unprocessed pages
    # (round-3 ADVICE, high).
    schemas = {"triples": triples.schema, "pages_text": enriched.schema}
    counts = None
    for tbl in ["triples", "pages_text"]:
        if not _partition_ids(out_root, tbl):
            continue
        g = (
            sinks.read_table_batch_rows(spark, out_root, tbl, schemas[tbl])
            .join(F.broadcast(done), "part_id", "left_anti")
            .groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(tbl).alias("tbl"), "part_id", "n")
        )
        counts = g if counts is None else counts.unionByName(g)
    count_rows = counts.collect() if counts is not None else []
    new_parts = [
        (r["part_id"], r["n"]) for r in count_rows if r["tbl"] == "triples"
    ]
    page_parts = [
        (r["part_id"], r["n"]) for r in count_rows if r["tbl"] == "pages_text"
    ]
    # a part whose pages yield zero mentions writes no triples
    # partition — commit it with n=0 anyway (from the pages_text
    # counts) or every later run re-extracts it
    counted = {p for p, _ in new_parts}
    for p, _ in page_parts:
        if p not in counted and p not in done_ids:
            new_parts.append((p, 0))
    manifest_rows = [("triples", p, n) for p, n in new_parts] + [
        ("pages_text", p, n) for p, n in page_parts
    ]
    if not prior_buckets and (
        new_parts or done_ids == set(range(buckets))
    ):
        # phase-wide part_id-mapping record, keyed to the triples
        # table (the resume driver); part_id carries the count.
        # Backfilled on a no-new-work legacy run ONLY under FULL
        # coverage (done_ids == every id the current mapping can
        # produce): an empty anti-join alone does not prove the legacy
        # commits used this count — a root partially extracted under
        # buckets=64 and rerun with 32 finds todo empty (ids 0..31 all
        # appear in done_ids) yet backfilling meta(32) would both
        # short-circuit the never-extracted pages away forever AND
        # make the mismatch guard reject the corrective 64 rerun —
        # converting a recoverable misconfiguration into permanent
        # manifest-endorsed data loss (round-4 ADVICE).
        manifest_rows.append(("triples", buckets, 0, sinks.BUCKETS_META))
    if manifest_rows:
        sinks.append_manifest_multi(spark, out_root, run_id, manifest_rows)
    if new_parts:
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


def delete_pages(
    spark: SparkSession,
    out_root: str,
    urls,
    run_id: str,
    buckets: int = DEFAULT_BUCKETS,
) -> dict:
    """Targeted page deletion (right-to-be-forgotten / takedown):
    remove pages by url from the durable corpus tables.

    Part-granular by construction: ``part_id = pmod(xxhash64(url),
    buckets)``, so N deleted urls touch at most N url-hash partitions
    of ``pages_text`` and ``triples`` — only those partitions are
    rewritten (anti-join + dynamic overwrite); every other partition
    is untouched on disk. At 100 TB this is the difference between a
    deletion being a few-partition job and a corpus rewrite.

    The rewrite PRESERVES streaming attempt tags (``_batch_run``): a
    partition's surviving rows are re-written byte-equivalent (minus
    the deleted urls, and minus crashed-attempt orphan rows — dropping
    those is vacuum-equivalent), so every visibility rule —
    marker-validity filtering, url reconciliation on re-crawled docs,
    resume anti-joins — behaves exactly as before the deletion. A new
    manifest commit per affected part flips exactly those parts' state
    tokens (:func:`sinks.pages_state_tokens`), so the next
    :func:`run_canonicalize_phase` heals ``edges``/``entities``/
    ``triples_canonical`` INCREMENTALLY: its doc-hash diff sees the
    vanished docs as changed and rewrites only the canonical
    partitions they contributed to. Derived tables are therefore
    eventually consistent; callers needing the canonical view purged
    in the same job run the canonicalize phase immediately after.
    ``pages_curated`` and the media tables are other phases' outputs
    and heal the same way on their next run.

    ``urls`` is a list/tuple/set of url strings or a DataFrame with a
    ``url`` column. Streamed-delivery marker totals in the manifest
    are historical (append-only) and are NOT rewritten; accounting
    consumers on mixed roots already fall back to durable counts.

    SINGLE-WRITER assumption (same contract as ``vacuum_streamed`` /
    ``compact_manifest``): do not run a deletion concurrently with an
    in-flight streaming attempt on the same parts — the rewrite drops
    un-markered tagged rows as crashed-attempt orphans, so a live
    attempt's pre-marker appends would be lost. Serialize deletions
    with the streaming writer (ADVICE r5, low).
    """
    t0 = time.time()
    if isinstance(urls, (list, tuple, set)):
        urls_df = spark.createDataFrame(
            [(u,) for u in sorted(urls)], "url string"
        )
    else:
        urls_df = urls.select("url")
    urls_df = urls_df.distinct()

    prior_buckets = sinks.recorded_buckets(spark, out_root, "triples")
    if prior_buckets and prior_buckets != {buckets}:
        raise ValueError(
            f"manifest at {out_root} was committed with "
            f"buckets={sorted(prior_buckets)}; this deletion uses "
            f"buckets={buckets} — part_id mappings differ; rerun with "
            "the original bucket count"
        )
    # the deletion list is small by nature (a takedown batch, not a
    # corpus); its part set drives partition pruning everywhere below
    target_parts = sorted(
        int(r["p"])
        for r in urls_df.select(
            F.pmod(F.xxhash64("url"), F.lit(buckets))
            .cast("int")
            .alias("p")
        )
        .distinct()
        .collect()
    )
    url_keys = F.broadcast(urls_df)

    mm = sinks.stream_marker_map(spark, out_root, ["pages_text", "triples"])
    deleted: dict[str, int] = {}
    manifest_rows: list[tuple] = []
    emptied: dict[str, list[int]] = {}
    parts_rewritten: dict[str, list[int]] = {}
    for tbl, key_col in (("pages_text", "url"), ("triples", "subj")):
        on_disk = set(_partition_ids(out_root, tbl))
        parts = [p for p in target_parts if p in on_disk]
        parts_rewritten[tbl] = parts
        emptied[tbl] = []
        deleted[tbl] = 0
        if not parts:
            continue
        markers = sorted(mm[tbl])
        raw = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(out_root, tbl)
        )
        tagged = "_batch_run" in raw.columns
        pruned = raw.where(F.col("part_id").isin(parts))
        if tagged:
            # durable rows only: batch rows + marker-valid streamed
            # rows; crashed-attempt orphans die with the rewrite
            pruned = pruned.where(
                F.col("_batch_run").isNull()
                | F.col("_batch_run").isin(markers)
            )
        hit = pruned.join(
            url_keys.withColumnRenamed("url", key_col), key_col, "left_semi"
        )
        keep = pruned.join(
            url_keys.withColumnRenamed("url", key_col), key_col, "left_anti"
        )
        # one pruned job answers everything the rewrite and the
        # manifest need: deletions per part, surviving rows per part
        # (batch vs tagged split), which parts empty out. A target
        # part none of the urls actually lives in is left COMPLETELY
        # alone — no rewrite, no commit, state token unchanged — so a
        # deletion never forces downstream re-shingles beyond the
        # parts it really mutated.
        stat_rows = (
            hit.groupBy("part_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.lit(0).cast("long").alias("n_batch"),
            )
            .withColumn("side", F.lit("hit"))
            .unionByName(
                keep.groupBy("part_id")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    (
                        F.count_if(F.col("_batch_run").isNull())
                        if tagged
                        else F.count(F.lit(1))
                    )
                    .cast("long")
                    .alias("n_batch"),
                )
                .withColumn("side", F.lit("keep"))
            )
            .collect()
        )
        hits = {
            int(r["part_id"]): int(r["n"])
            for r in stat_rows
            if r["side"] == "hit"
        }
        survivors = {
            int(r["part_id"]): (int(r["n"]), int(r["n_batch"]))
            for r in stat_rows
            if r["side"] == "keep"
        }
        deleted[tbl] = sum(hits.values())
        mutated = sorted(hits)
        parts_rewritten[tbl] = mutated
        live = [p for p in mutated if p in survivors]
        if live:
            # pin the survivors BEFORE the dynamic overwrite: the keep
            # frame lazily reads the same parquet directory the write
            # replaces — every other self-overwrite in the repo
            # (triples/entities IVM) materializes first, and without
            # it a task retry or speculative re-read after commit
            # begins can read already-replaced files (ADVICE r5, low)
            out = materialize(keep.where(F.col("part_id").isin(live)))
            if tagged and all(
                survivors[p][0] == survivors[p][1] for p in live
            ):
                # no tagged row survives anywhere we rewrite: drop the
                # column rather than bake an all-null _batch_run into
                # pure-batch partitions (a stale-marker root would
                # otherwise pay streamed-root reconciliation forever —
                # surviving-tagged-file detection keys on the column)
                out = out.drop("_batch_run")
            sinks.write_partitioned(out, out_root, tbl, shuffle=False)
        for p in mutated:
            if p not in survivors:
                # dynamic overwrite only replaces partitions PRESENT
                # in the frame — a partition losing all rows must be
                # removed explicitly and committed at zero
                d = os.path.join(out_root, tbl, f"part_id={p}")
                if os.path.isdir(d):
                    shutil.rmtree(d)
                emptied[tbl].append(p)
        # Commit the BATCH row count (marker totals stay the historical
        # record of streamed deliveries) for EVERY on-disk target part,
        # hit or not (ADVICE r5, medium): a crash between the rewrites
        # above and this append leaves the deleted urls gone from
        # pages_text but the state tokens unchanged, so canonicalize
        # would keep certifying stale derived tables — and a re-run of
        # the same deletion would find 0 hits and commit nothing,
        # making the staleness permanent. Committing every target part
        # flips its token, so RE-RUNNING the deletion always forces
        # the heal; the cost is re-shingling ≤ |urls| extra parts.
        for p in parts:
            manifest_rows.append(
                (tbl, p, survivors.get(p, (0, 0))[1])
            )
    if manifest_rows:
        sinks.append_manifest_multi(spark, out_root, run_id, manifest_rows)
    return {
        "run_id": run_id,
        "urls_requested": urls_df.count(),
        "rows_deleted": deleted,
        "parts_rewritten": {
            t: [p for p in ps] for t, ps in parts_rewritten.items()
        },
        "parts_emptied": emptied,
        "seconds": time.time() - t0,
    }


def _canon_outputs_intact(
    spark: SparkSession, out_root: str
) -> tuple[dict, bool]:
    """Parquet footer counts of the three canonical output tables vs
    their latest-per-part manifest commits. Cheap (metadata reads) and
    the shared integrity probe of BOTH reuse paths: the zero-change
    short-circuit (don't certify a crashed overwrite) and the delta
    path's kept-edge/old-raw reuse (don't recycle a partial table a
    crashed output wave left behind — ADVICE r5, high)."""
    out_tables = ["edges", "entities", "triples_canonical"]
    summ = sinks.manifest_summary(spark, out_root, out_tables)
    counts = {}
    intact = True
    for tbl in out_tables:
        expected = summ[tbl]["committed_total"] or 0
        actual = (
            sinks.read_table(spark, out_root, tbl).count()
            if _partition_ids(out_root, tbl)
            else 0
        )
        counts[tbl] = actual
        if actual != expected:
            intact = False
            break
    return counts, intact


def _canon_params_hash(jaccard_threshold: float, buckets: int) -> int:
    """Hash of every knob the persisted canonicalization state depends
    on: signatures (shingle n, MinHash k), candidate generation (LSH
    band geometry, bucket cap), verification (threshold), and the
    part_id mapping the snapshot tokens are keyed under. Any change
    invalidates the delta path wholesale."""
    from spinneret_spark.functions.hashing import MINHASH_K

    return sinks._token_hash(
        f"j={jaccard_threshold}|n=3|k={MINHASH_K}|bands=4x4|cap=500"
        f"|buckets={buckets}"
    )


def run_canonicalize_phase(
    spark: SparkSession,
    out_root: str,
    run_id: str,
    jaccard_threshold: float = 0.8,
    buckets: int = DEFAULT_BUCKETS,
    incremental: bool = True,
    provenance: bool = True,
    compose: bool = True,
) -> dict:
    """Whole-corpus phase: near-dup edges → entities → canonical
    triples. Reads the materialized ``pages_text`` table (written by
    the extract phase) — never re-extracts HTML.

    **Incremental (delta) canonicalization** (default): the expensive
    stage at 100 TB is re-shingling + re-signing every document each
    run — CC and the triple rewrite are JVM-side joins over far
    smaller relations. Each run therefore persists its MinHash
    signatures (``canon_signatures``, partitioned by part_id) plus a
    per-part state-token snapshot in the manifest
    (:func:`sinks.pages_state_tokens`), and the next run:

    * recomputes signatures ONLY for parts whose token changed (new
      batch commit or new marker-valid streamed append) — dynamic
      partition overwrite keeps unchanged parts' signatures;
    * re-bands the signature union (pure-JVM expressions over k longs
      per doc — cheap) but VERIFIES only candidate pairs touching a
      changed part: unchanged-unchanged pairs keep their verdict from
      the persisted ``edges`` table (texts unchanged ⇒ Jaccard
      unchanged);
    * re-runs connected components over prior-kept ∪ newly-verified
      edges (a new doc can bridge two old components, so CC is always
      global — it is cheap: edges are the small relation). On an
      ADDITIVE increment (new docs only: nothing vanished, no content
      changed, no LSH bucket capped for the probes) even that is
      skipped: merges are monotone, so the run composes the PERSISTED
      assignment with a tiny supernode remap (CC over the new edges'
      old canonical labels — labels are component minima, so
      min-composition is exact), recomputes per-part assignment
      hashes only for parts holding a new or relabeled doc, and
      rewrites the ``entities`` table partition-granularly (touched
      components recomputed exactly from one filtered scan of the
      narrow persisted assignment — the capped member arrays are a
      browsing surface, never the source of truth). An additive delta
      run therefore performs NO full-corpus scan of any relation:
      its cost is O(changed partitions + new edges), which is the
      property that makes per-micro-batch canonicalization viable at
      10^12 documents. Any gate failure (deletion, re-crawl, capped
      bucket, >100k-component entanglement, integrity-repair run)
      falls back to the general global recompute;
    * rewrites edges wholesale (the SMALL relation) and, outside the
      composed path, entities too; for corpus-sized
      ``triples_canonical`` it maintains
      provenance state — ``canon_triples_raw`` (one row per source
      triple, partitioned by canonical hash), ``canon_assignment``
      (doc → canonical), ``canon_doc_hash`` (doc → text hash, pruned
      by source part) plus per-part assignment hashes in the manifest
      — and, when the set of DOC-granular changes (content hash
      moved, assignment moved, doc appeared/vanished) maps to at most
      half the canonical partitions, rewrites only those partitions
      via incremental view maintenance (src_id anti-join removes the
      changed docs' old contributions; the dedup survivor is
      deterministic, so untouched partitions stay byte-identical).
      Outside that win region — changed docs scatter over every hash
      partition — it falls back to the one narrow join + full write,
      which is the irreducible cost of emitting a corpus-sized
      output (measured: the partition path LOSES there,
      BENCH/BASELINE.md);
    * with ZERO changed parts, short-circuits entirely: the snapshot
      (appended only after all outputs land) certifies the outputs,
      so the run reduces to one manifest read plus parquet
      footer-count integrity checks on the three output tables —
      a count/manifest mismatch (e.g. a previously crashed
      zero-change overwrite) falls through to the normal path,
      which rebuilds from the persisted signatures.

    ``provenance=False`` skips maintaining the triple-rewrite
    provenance state entirely (measured ~20% cheaper full rewrites at
    400k) at the price of disabling the partition-granular rewrite on
    later runs until a ``provenance=True`` run refreshes it — the
    right trade for bulk-batch-only deployments; signature reuse and
    the zero-change short-circuit are unaffected.

    Output equals the from-scratch run whenever the LSH bucket cap
    never binds (the cap drops candidates per-bucket, so a bucket
    pushed over the cap by NEW docs can differ between the two
    orders — both are approximations; the verify stage keeps
    precision exact either way). A parameter change (threshold,
    bucket count) or a missing snapshot falls back to the full
    recompute automatically; ``incremental=False`` forces it.
    """
    t0 = time.time()
    empty_stats = {
        "run_id": run_id,
        "n_entities": 0,
        "n_edges": 0,
        "n_canonical_triples": 0,
        "parts_total": 0,
        "parts_reshingled": 0,
        "delta": False,
        "seconds": 0.0,
    }
    parts_on_disk = set(_partition_ids(out_root, "pages_text"))
    if not parts_on_disk:
        # empty corpus: a zero-row partitioned parquet table has no
        # data files and no readable schema — exit before touching it
        empty_stats["seconds"] = time.time() - t0
        return empty_stats

    # change detection: one manifest read each. Parts with durable
    # files but no manifest evidence (crashed pre-commit extract) get
    # no token and are treated as changed every run.
    tokens_now = sinks.pages_state_tokens(spark, out_root, "pages_text")
    params_hash = _canon_params_hash(jaccard_threshold, buckets)
    snap = sinks.latest_canon_state(spark, out_root) if incremental else None
    delta_ok = (
        snap is not None
        and snap["params"] == params_hash
        and bool(_partition_ids(out_root, "canon_signatures"))
    )
    if delta_ok:
        unchanged = sorted(
            p
            for p in parts_on_disk
            if p in tokens_now and snap["parts"].get(p) == tokens_now[p]
        )
    else:
        unchanged = []
    # diff over disk ∪ snapshot: a part the snapshot covered that has
    # VANISHED from disk (a deletion emptied it) is a changed part —
    # its docs must drop out of signatures/edges/entities and its
    # canonical-triple contributions must be rewritten away. Without
    # the union, an emptied-part-only deletion leaves delta_parts
    # empty and the zero-change short-circuit would certify the STALE
    # canonical outputs. After the healing run the new snapshot covers
    # only on-disk parts, so the ghost drops out and later no-change
    # runs short-circuit again.
    snap_parts = set(snap["parts"]) if delta_ok else set()
    delta_parts = sorted((parts_on_disk | snap_parts) - set(unchanged))

    # set when the zero-change integrity probe finds a corrupted
    # output (a crashed prior overwrite): this run IS the repair, so
    # every partial path (composed assignment, triple/entity IVM) is
    # disabled — they skip untouched partitions by design and would
    # leave the damage in place forever
    heal_full = False
    if delta_ok and not delta_parts:
        # Zero-change short-circuit: no part's state token moved since
        # the snapshot, so every downstream relation (signatures →
        # candidates → edges → components → entities → canonical
        # triples) is provably identical to the previous completed run
        # — the snapshot row is appended only after all outputs land,
        # so its presence certifies them, and every triples mutation in
        # this codebase accompanies a pages_text mutation of the same
        # part (extract and the streaming skins commit both), so the
        # pages_text tokens cover the triples input too. Verify output
        # integrity before trusting it (a LATER zero-change run may
        # have crashed mid-overwrite, leaving identical-content but
        # incomplete tables): parquet counts are footer-metadata
        # reads, far cheaper than re-banding + CC + the triple
        # rewrite. On mismatch fall through — the normal path re-derives
        # everything from the persisted signatures and self-heals.
        counts, intact = _canon_outputs_intact(spark, out_root)
        if intact:
            return {
                "run_id": run_id,
                "n_entities": counts["entities"],
                "n_edges": counts["edges"],
                "n_canonical_triples": counts["triples_canonical"],
                "parts_total": len(parts_on_disk),
                "parts_reshingled": 0,
                "delta": True,
                "short_circuit": True,
                "seconds": time.time() - t0,
            }
        heal_full = True
    if delta_ok and unchanged and delta_parts and not heal_full:
        # Delta-path integrity probe (ADVICE r5, high): this run will
        # reuse the persisted edges (kept unchanged-unchanged pairs)
        # and, on the IVM paths, old_raw/old_ents. A crash during a
        # prior run's OUTPUT write wave leaves a partial table with
        # the old manifest still in force — and because real changes
        # exist, the zero-change probe above never fires. Verify the
        # same count-vs-manifest invariant before trusting any
        # persisted output; on mismatch this run becomes the repair:
        # heal_full disables every reuse/partial path below and the
        # outputs are rebuilt wholesale from the persisted signatures.
        _, intact = _canon_outputs_intact(spark, out_root)
        if not intact:
            heal_full = True

    # read_durable: all batch-written rows + marker-valid streamed
    # rows — streamed pages canonicalize like any other page, while
    # crashed-attempt orphans and replay duplicates stay invisible
    durable, has_streamed = sinks.read_durable_tagged(
        spark, out_root, "pages_text"
    )

    def _docs_view(df: DataFrame) -> DataFrame:
        docs = df.select(F.col("url").alias("doc_id"), "text")
        if has_streamed:
            # a url delivered by BOTH paths (batch commit + a later
            # streamed re-crawl appended into an already-committed
            # part) must canonicalize as ONE doc — deterministic
            # first-seen by content. Only roots where tagged files
            # SURVIVE pay this shuffle (all copies of a url share a
            # part, so the delta-filtered view dedups identically).
            docs = docs.groupBy("doc_id").agg(F.min("text").alias("text"))
        return docs

    docs = _docs_view(durable)

    def _part_of(col: str):
        # part_id is a pure function of the url, so pair endpoints can
        # be mapped to parts without carrying the column around
        return F.pmod(F.xxhash64(col), F.lit(buckets)).cast("int")

    # signatures: Arrow kernel over CHANGED parts only (partition-
    # pruned read); unchanged parts reuse the persisted table
    if delta_ok and unchanged:
        docs_delta = _docs_view(
            durable.where(F.col("part_id").isin([int(p) for p in delta_parts]))
        )
    else:
        docs_delta = docs
    from spinneret_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_against,
        minhash_signatures_pandas,
    )

    _t = {"prev": t0}  # phase start: first lap covers change detection

    def _lap(name: str) -> None:
        # coarse section wall-times for the stats dict: Spark is lazy,
        # so each lap is anchored on an eager boundary (materialize /
        # collect / write wave) and reads as "everything since the
        # previous boundary"
        now = time.time()
        _timings[name] = round(
            _timings.get(name, 0.0) + (now - _t["prev"]), 2
        )
        _t["prev"] = now

    _timings: dict[str, float] = {}
    _lap("change_detect")
    sigs_new = materialize(
        minhash_signatures_pandas(docs_delta, id_col="doc_id")
    )
    if delta_parts:
        # persist for the NEXT run: dynamic overwrite rewrites only
        # the changed parts' signature partitions on the delta path;
        # the full path replaces the table wholesale
        sinks.write_partitioned(
            sigs_new.withColumn("part_id", _part_of("id")),
            out_root,
            "canon_signatures",
            shuffle=False,
            full_overwrite=not delta_ok,
        )
    _lap("signatures")
    if delta_ok and unchanged:
        sigs_old = (
            sinks.read_table(spark, out_root, "canon_signatures")
            .where(F.col("part_id").isin([int(p) for p in unchanged]))
            .drop("part_id")
        )
        sigs_all = sigs_old.unionByName(sigs_new)
    else:
        sigs_all = sigs_new

    # banding is k-longs-per-doc cheap; only pairs touching a changed
    # part go to verification (signatures were checkpointed / are a
    # parquet read, so no materialize inside the band join). On the
    # delta path the band join is ASYMMETRIC: the re-signed docs
    # (tiny) broadcast against the full bucket relation — same pair
    # set as self-join + touching-changed-part filter, without
    # shuffling corpus×bands rows (8.6 s → map-side at 400k).
    docs_verify = docs
    band_stats: dict = {}
    # heal_full gates BOTH shortcuts here: the asymmetric probe join
    # only finds pairs touching a changed part and the kept-edge merge
    # below recycles the persisted table — a repair run must rebuild
    # the complete edge set from the (valid) persisted signatures via
    # the full symmetric band join instead
    if delta_ok and unchanged and not heal_full:
        candidates = materialize(
            lsh_candidate_pairs_against(
                sigs_new, sigs_all, stats_out=band_stats
            )
        )
        # Exact-Jaccard verification re-shingles only candidate
        # ENDPOINT docs, but the semi-join inside the verify operator
        # still scans every pages_text row's text bytes to find them.
        # Endpoint part ids are a pure function of the id, and
        # pages_text is partitioned by part_id on disk — so collect
        # the (few) parts candidates touch and partition-prune the
        # verify scan to them. Superset-sound: pruning keeps every
        # candidate endpoint, and all copies of a url share a part,
        # so the streamed-dedup view is unchanged.
        cand_parts = sorted(
            int(r["p"])
            for r in candidates.select(
                F.explode(
                    F.array(_part_of("id_a"), _part_of("id_b"))
                ).alias("p")
            )
            .distinct()
            .collect()
        )
        if len(cand_parts) < len(parts_on_disk):
            docs_verify = _docs_view(
                durable.where(F.col("part_id").isin(cand_parts))
            )
    else:
        candidates = lsh_candidate_pairs(sigs_all, materialize=False)
    new_edges = verify_candidate_pairs(
        docs_verify, candidates, jaccard_threshold, id_col="doc_id"
    )
    if delta_ok and unchanged:
        # pinned separately from the merge: the composed-assignment
        # path below consumes the NEW edges alone (they are the only
        # possible component merges on an additive increment)
        new_edges = materialize(new_edges)
    if (
        delta_ok
        and unchanged
        and not heal_full
        and _partition_ids(out_root, "edges")
    ):
        # unchanged-unchanged pairs keep their prior verdict; every
        # edge touching a changed part is dropped (re-discovered via
        # the delta candidates if still a near-dup) — which also
        # retires edges of deleted/rewritten docs, since any deletion
        # changes its part's token
        kept = (
            sinks.read_table(spark, out_root, "edges")
            .where(
                _part_of("id_a").isin([int(p) for p in unchanged])
                & _part_of("id_b").isin([int(p) for p in unchanged])
            )
            .select("id_a", "id_b", "jaccard")
        )
        merged_edges = kept.unionByName(new_edges)
    else:
        merged_edges = new_edges

    # edges and assignment feed multiple downstream actions (CC loop,
    # entity rollup, triple rewrite, writes) — localCheckpoint both:
    # eager one-shot materialization (a lazy .cache() recomputes the
    # whole LSH/verify lineage per consumer until its first fill, and
    # can race its own fill across concurrent consumers)
    _lap("band_plan")
    edges = materialize(merged_edges)
    _lap("verify_edges")

    # a corpus where NO page yields a mention has no triples table on
    # disk (same no-files-no-schema hazard); entities/edges still exist
    have_triples = bool(_partition_ids(out_root, "triples"))
    old_assign_hashes = dict(snap.get("assign", {})) if delta_ok else {}

    # ---- COMPOSED (incremental) assignment ----
    # On an ADDITIVE increment (new docs only: nothing vanished, no
    # content changed, no LSH bucket capped) component merges are
    # MONOTONE, so the new assignment is the old one composed with a
    # tiny remap: map the NEW edges' endpoints to their old canonical
    # labels, run CC over that supernode graph (labels are component
    # minima, so min-composition stays exact), and relabel. The full-
    # corpus CC + docs scan + corpus-sized assignment checkpoint of
    # the general path all disappear — an additive delta run touches
    # only the partitions the increment actually reaches. Any gate
    # failure falls back to the general recompute below, which remains
    # the source of truth for deletions, re-crawls, parameter changes
    # and capped buckets.
    composed = False
    changed_pre = None  # (doc_id, canonical_id, old_canonical)
    new_docs_assign = None
    comp_df = None  # (canonical_id, new_canonical), identity included
    affected_rows = None
    assign_parted = None
    new_doc_h = None
    compose_ok = (
        compose
        and delta_ok
        and not heal_full
        and bool(unchanged)
        and provenance
        and bool(old_assign_hashes)
        and bool(_partition_ids(out_root, "canon_assignment"))
        and bool(_partition_ids(out_root, "canon_doc_hash"))
        and band_stats.get("capped_buckets") == 0
    )
    delta_set = [int(p) for p in delta_parts]
    if compose_ok:
        old_doc_h_delta = (
            sinks.read_table(spark, out_root, "canon_doc_hash")
            .where(F.col("part_id").isin(delta_set))
            .select("doc_id", F.col("h").alias("old_h"))
        )
        new_doc_h = materialize(
            docs_delta.select("doc_id", F.xxhash64("text").alias("h"))
        )
        # additive ⇔ every previously-known doc of the changed parts
        # is still present with identical content (one narrow pruned
        # probe; a deletion or re-crawl trips it and takes the general
        # path, which handles component SPLITS)
        nonadditive = (
            old_doc_h_delta.join(new_doc_h, "doc_id", "left")
            .where(F.col("h").isNull() | (F.col("h") != F.col("old_h")))
            .limit(1)
            .count()
        )
        compose_ok = nonadditive == 0
        _lap("compose_gate")
    if compose_ok:
        # supernode graph, built in exactly TWO jobs with no shuffle:
        # (1) collect the new edge pairs (tiny by the additive-
        # increment premise; capped), (2) one partition-pruned scan of
        # the persisted narrow assignment filtered to the endpoint
        # docs — endpoints map to their old canonical labels, new docs
        # are their own label, union-find runs on the driver.
        edge_rows = new_edges.select("id_a", "id_b").limit(100_001).collect()
        if len(edge_rows) > 100_000:
            # an increment producing >100k new near-dup pairs is not a
            # micro-batch — the general path's distributed CC is the
            # right tool there
            compose_ok = False
        old_assign_tbl = sinks.read_table(
            spark, out_root, "canon_assignment"
        )
    if compose_ok:
        ep_id_set = set()
        for r in edge_rows:
            ep_id_set.add(r["id_a"])
            ep_id_set.add(r["id_b"])
        ep_parts = sorted(set(cand_parts) | set(delta_set))
        ep_df = spark.createDataFrame(
            [(i,) for i in sorted(ep_id_set)] or [], "doc_id string"
        )
        label = {
            r["doc_id"]: r["canonical_id"]
            for r in old_assign_tbl.where(
                F.col("part_id").isin(ep_parts)
            )
            .select("doc_id", "canonical_id")
            .join(F.broadcast(ep_df), "doc_id", "left_semi")
            .collect()
        }
        _lap("compose_supernodes")
        # driver union-find with path compression; component label =
        # MIN member label, which composes exactly (old labels are
        # their components' min doc ids)
        parent: dict = {}

        def _find(x):
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != root:
                parent[x], x = root, parent[x]
            return root

        nodes_seen: set = set()
        for r in edge_rows:
            a = label.get(r["id_a"], r["id_a"])
            b = label.get(r["id_b"], r["id_b"])
            if a == b:
                continue
            nodes_seen.add(a)
            nodes_seen.add(b)
            ra, rb = _find(a), _find(b)
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        comp = {x: _find(x) for x in nodes_seen}
        comp_schema = "canonical_id string, new_canonical string"
        comp_df = spark.createDataFrame(
            sorted(comp.items()) or [], comp_schema
        )
        remap_df = spark.createDataFrame(
            sorted((k, v) for k, v in comp.items() if k != v) or [],
            comp_schema,
        )
        # ONE filtered scan of the narrow persisted assignment yields
        # both the relabeled docs and the FULL membership of every
        # touched component (the capped entity member arrays are a
        # browsing surface, not the source of truth). Crash-safe and
        # idempotent: the state wave lands strictly after the output
        # wave, so a rerun after any crash reads the same old state.
        affected_rows = materialize(
            old_assign_tbl.join(F.broadcast(comp_df), "canonical_id")
            .select("doc_id", "canonical_id", "new_canonical", "part_id")
        )
        _lap("compose_affected_scan")
        relabeled = affected_rows.where(
            F.col("canonical_id") != F.col("new_canonical")
        )
        new_docs_assign = materialize(
            new_doc_h.join(
                old_doc_h_delta.select("doc_id"), "doc_id", "left_anti"
            )
            .select("doc_id")
            .join(
                F.broadcast(
                    comp_df.withColumnRenamed("canonical_id", "doc_id")
                ),
                "doc_id",
                "left",
            )
            .select(
                "doc_id",
                F.coalesce("new_canonical", F.col("doc_id")).alias(
                    "canonical_id"
                ),
            )
        )
        # full-corpus assignment as a LAZY relation: a map-side
        # broadcast-remap over the persisted table — consumers that
        # can prune by part_id stay pruned; only the (rare) scatter-
        # gate fallbacks pay the full narrow scan
        assign_parted = old_assign_tbl.join(
            F.broadcast(remap_df), "canonical_id", "left"
        ).select(
            "part_id",
            "doc_id",
            F.coalesce("new_canonical", F.col("canonical_id")).alias(
                "canonical_id"
            ),
        ).unionByName(
            new_docs_assign.select(
                _part_of("doc_id").alias("part_id"),
                "doc_id",
                "canonical_id",
            )
        )
        assignment_sel = assign_parted.select("doc_id", "canonical_id")
        # per-part hashes: recompute ONLY parts holding a new or
        # relabeled doc; every other part's rows are identical so its
        # snapshot hash carries over
        relabel_parts = {
            int(r["part_id"])
            for r in relabeled.select("part_id").distinct().collect()
        }
        touched_parts = sorted(set(delta_set) | relabel_parts)
        assign_hashes = dict(old_assign_hashes)
        for p in touched_parts:
            assign_hashes.pop(p, None)
        _lap("compose_new_docs")
        for r in (
            assign_parted.where(F.col("part_id").isin(touched_parts))
            .groupBy("part_id")
            .agg(
                F.bit_xor(
                    F.xxhash64(F.concat_ws("#", "doc_id", "canonical_id"))
                ).alias("h")
            )
            .collect()
        ):
            assign_hashes[int(r["part_id"])] = int(r["h"])
        _lap("compose_hashes")
        changed_pre = materialize(
            relabeled.select(
                "doc_id",
                F.col("new_canonical").alias("canonical_id"),
                F.col("canonical_id").alias("old_canonical"),
            ).unionByName(
                new_docs_assign.select(
                    "doc_id",
                    "canonical_id",
                    F.lit(None).cast("string").alias("old_canonical"),
                )
            )
        )
        composed = True
    if not composed:
        assignment = materialize(
            canonical_entities(docs, edges, id_col="doc_id")
        )
        # Per-part entity-assignment hashes: the change signal for the
        # incremental triple rewrite. bit_xor keeps the fold order-
        # independent and overflow-free (doc_id is unique, so no even-
        # multiplicity cancellation); one narrow aggregation, no join.
        assignment_sel = assignment.select("doc_id", "canonical_id")
        assign_hashes = {}
        if provenance:
            assign_hashes = {
                int(r["part_id"]): int(r["h"])
                for r in assignment_sel.groupBy(
                    _part_of("doc_id").alias("part_id")
                )
                .agg(
                    F.bit_xor(
                        F.xxhash64(
                            F.concat_ws("#", "doc_id", "canonical_id")
                        )
                    ).alias("h")
                )
                .collect()
            }
    _lap("components_assignment")
    changed_assign_parts = sorted(
        p
        for p in set(assign_hashes) | set(old_assign_hashes)
        if assign_hashes.get(p) != old_assign_hashes.get(p)
    )
    affected_src = sorted(
        set(changed_assign_parts) | {int(p) for p in delta_parts}
    )
    # Incremental triple rewrite is sound iff: the delta machinery is
    # valid, the previous snapshot recorded assignment hashes (pre-
    # upgrade snapshots did not), the provenance tables exist, and
    # some source part is provably untouched (content token AND
    # assignment hash unchanged ⇒ its contribution to every canonical
    # partition is byte-identical — dedup survivors are deterministic).
    triples_delta = (
        provenance
        and delta_ok
        and not heal_full
        and bool(unchanged)
        and bool(old_assign_hashes)
        and have_triples
        and bool(_partition_ids(out_root, "canon_triples_raw"))
        and bool(_partition_ids(out_root, "canon_assignment"))
        and bool(_partition_ids(out_root, "canon_doc_hash"))
        and len(affected_src) < len(parts_on_disk)
    )

    # whole-corpus tables: STATIC overwrite — recomputed per run, so
    # earlier runs' partitions must be replaced wholesale (edges and
    # entities are the SMALL relations; triples_canonical is corpus-
    # sized and gets the incremental path below). All independent
    # table writes are DEFERRED into closures and committed on
    # concurrent driver threads below: each write is a separate Spark
    # job whose driver-side commit bookkeeping is pure fixed cost, and
    # run serially the provenance tables would double the phase's job
    # count (the media phase's concurrent-commit lesson, round 4).
    write_tasks: list = []
    state_tasks: list = []
    edges_out = edges.withColumn(
        "part_id", F.pmod(F.xxhash64("id_a"), F.lit(buckets)).cast("int")
    )
    write_tasks.append(
        lambda: sinks.write_partitioned(
            edges_out, out_root, "edges", full_overwrite=True
        )
    )
    # member lists capped: a boilerplate mega-cluster must not produce
    # a row bigger than an executor (count stays exact)
    ent_written_parts: list[int] | None = None
    ent_emptied: list[int] = []
    ents_ivm = None
    if composed and _partition_ids(out_root, "entities"):
        # entities IVM: rows change only for touched components and
        # new docs — recompute those EXACTLY from the affected-rows
        # scan (full membership) + new docs, and rewrite only the
        # canonical-hash partitions they live in. Same scatter gate as
        # the canonical-triple rewrite.
        ents_new = materialize(
            entity_table(
                affected_rows.select(
                    "doc_id", F.col("new_canonical").alias("canonical_id")
                ).unionByName(
                    new_docs_assign.select("doc_id", "canonical_id")
                ),
                id_col="doc_id",
                max_members=1024,
            ).withColumn(
                "part_id",
                F.pmod(F.xxhash64("canonical_id"), F.lit(buckets)).cast(
                    "int"
                ),
            )
        )
        # removal set = every touched OLD label (losers vanish,
        # winners are replaced) ∪ every recomputed label (makes a
        # rerun after a mid-write crash idempotent: already-written
        # new rows — singleton new docs included — are removed and
        # re-added identically)
        removal_df = (
            comp_df.select("canonical_id")
            .unionByName(ents_new.select("canonical_id"))
            .distinct()
        )
        ent_out_parts = sorted(
            int(r["p"])
            for r in removal_df.select(
                F.pmod(F.xxhash64("canonical_id"), F.lit(buckets))
                .cast("int")
                .alias("p")
            )
            .distinct()
            .collect()
        )
        if len(ent_out_parts) <= len(parts_on_disk) // 2:
            old_ents = sinks.read_table(spark, out_root, "entities").where(
                F.col("part_id").isin(ent_out_parts)
            )
            kept_ents = old_ents.join(
                F.broadcast(removal_df), "canonical_id", "left_anti"
            )
            ents_ivm = materialize(
                kept_ents.unionByName(ents_new.select(*old_ents.columns))
            )
            present_ent = {
                int(r["part_id"])
                for r in ents_ivm.select("part_id").distinct().collect()
            }
            ent_emptied = sorted(set(ent_out_parts) - present_ent)
            write_tasks.append(
                lambda: sinks.write_partitioned(
                    ents_ivm, out_root, "entities", full_overwrite=False
                )
            )
            ent_written_parts = ent_out_parts
    if ent_written_parts is None:
        ents = entity_table(
            assignment_sel, id_col="doc_id", max_members=1024
        ).withColumn(
            "part_id",
            F.pmod(F.xxhash64("canonical_id"), F.lit(buckets)).cast("int"),
        )
        write_tasks.append(
            lambda: sinks.write_partitioned(
                ents, out_root, "entities", full_overwrite=True
            )
        )

    # canonical triples: full rewrite persists the provenance relation
    # (canon_triples_raw: one row per SOURCE triple, partitioned by
    # the canonical subject's hash) so later runs can do incremental
    # view maintenance; the delta path rewrites only canonical
    # partitions some changed document contributes to (old home, new
    # home, or new triples) — everything else is untouched on disk.
    canon_written_parts: list[int] | None = None  # None → all (full)
    emptied_parts: list[int] = []
    if have_triples:
        triples = sinks.read_committed(
            spark, out_root, "triples", statuses=("committed", "streamed")
        )
        out_parts: list[int] | None = None
        changed = None
        if triples_delta:
            aff = [int(p) for p in affected_src]
            if changed_pre is not None:
                # composed path: the changed-doc set (relabeled ∪ new)
                # fell directly out of the supernode remap — no
                # full-outer diff joins needed
                changed = changed_pre
            else:
                old_assign = (
                    sinks.read_table(spark, out_root, "canon_assignment")
                    .where(F.col("part_id").isin(aff))
                    .select(
                        "doc_id",
                        F.col("canonical_id").alias("old_canonical"),
                    )
                )
                new_aff = assignment_sel.where(
                    _part_of("doc_id").isin(aff)
                )
                # DOC-granular content change detection: a token covers
                # a whole part, but an append micro-batch leaves most
                # of the part's docs byte-identical — treating them all
                # as changed would scatter the rewrite over every
                # canonical partition (part sizes exceed the bucket
                # count at any real scale). The persisted per-doc
                # text-hash relation (canon_doc_hash, pruned to the
                # changed parts, narrow) pins down exactly which docs'
                # triples can differ.
                old_doc_h = (
                    sinks.read_table(spark, out_root, "canon_doc_hash")
                    .where(F.col("part_id").isin(delta_set))
                    .select("doc_id", F.col("h").alias("old_h"))
                )
                new_doc_h = docs_delta.select(
                    "doc_id", F.xxhash64("text").alias("h")
                )
                content_changed = (
                    new_doc_h.join(old_doc_h, "doc_id", "full_outer")
                    .where(
                        F.col("old_h").isNull()
                        | F.col("h").isNull()
                        | (F.col("old_h") != F.col("h"))
                    )
                    .select("doc_id", F.lit(True).alias("_cc"))
                )
                # changed docs: assignment moved, doc appeared/
                # vanished, or content changed (triples may differ)
                changed = materialize(
                    new_aff.join(old_assign, "doc_id", "full_outer")
                    .join(content_changed, "doc_id", "left")
                    .where(
                        F.col("old_canonical").isNull()
                        | F.col("canonical_id").isNull()
                        | (
                            F.col("old_canonical")
                            != F.col("canonical_id")
                        )
                        | F.col("_cc")
                    )
                    .drop("_cc")
                )
            out_parts = sorted(
                int(r["p"])
                for r in changed.select(
                    F.explode(
                        F.array_compact(
                            F.array(
                                _part_of("canonical_id"),
                                _part_of("old_canonical"),
                            )
                        )
                    ).alias("p")
                )
                .distinct()
                .collect()
            )
            # GATE (measured at 400k, BENCH/BASELINE.md): canonical
            # homes are hash-distributed, so any increment with more
            # changed docs than ~half the bucket count scatters over
            # every output partition — "incremental" then rewrites all
            # the same bytes PLUS the anti-join/union overhead (41.3 s
            # vs 34.7 s for the plain join at +10%). Partition-granular
            # maintenance only pays in its win region: few changed
            # docs relative to buckets (targeted re-crawls, single
            # micro-batches). Outside it, fall through to the one
            # narrow join + write — the irreducible cost of emitting a
            # corpus-sized output.
            if len(out_parts) > len(parts_on_disk) // 2:
                out_parts = None
        if triples_delta and out_parts is not None:
            if out_parts:
                tri_changed = triples.where(
                    F.col("part_id").isin(aff)
                ).join(
                    changed.select(F.col("doc_id").alias("subj")),
                    "subj",
                    "left_semi",
                )
                # every changed doc lives in an aff part, so on the
                # composed path the rewrite join reads only those
                # partitions of the persisted assignment
                assign_for_rewrite = (
                    assign_parted.where(F.col("part_id").isin(aff))
                    .select("doc_id", "canonical_id")
                    if composed
                    else assignment_sel
                )
                remapped = rewrite_triples_raw(
                    tri_changed,
                    assign_for_rewrite,
                    subj_prefix="",
                    id_col="doc_id",
                ).withColumn("part_id", _part_of("subj"))
                old_raw = sinks.read_table(
                    spark, out_root, "canon_triples_raw"
                ).where(F.col("part_id").isin(out_parts))
                kept_raw = old_raw.join(
                    changed.select(F.col("doc_id").alias("src_id")),
                    "src_id",
                    "left_anti",
                )
                # anti-join on src_id makes the overwrite idempotent:
                # a crashed delta run's already-remapped rows are
                # removed and re-added identically on replay
                new_raw = materialize(
                    kept_raw.unionByName(remapped.select(*kept_raw.columns))
                )
                # dynamic overwrite only replaces partitions PRESENT in
                # the written frame — a partition whose every subject
                # merged into entities hashed elsewhere ends up with
                # zero rows and must be cleared explicitly, else its
                # stale rows survive (and stale RAW rows would corrupt
                # every future delta)
                present = {
                    int(r["part_id"])
                    for r in new_raw.select("part_id").distinct().collect()
                }
                emptied_parts = sorted(set(out_parts) - present)
                write_tasks.append(
                    lambda: sinks.write_partitioned(
                        new_raw, out_root, "canon_triples_raw",
                        full_overwrite=False,
                    )
                )
                write_tasks.append(
                    lambda: sinks.write_partitioned(
                        dedup_canonical_triples(new_raw),
                        out_root,
                        "triples_canonical",
                        full_overwrite=False,
                    )
                )
            canon_written_parts = out_parts
        elif provenance:
            # full rewrite (first run, invalidated snapshot, or the
            # scatter gate above): the rewrite join is computed ONCE
            # (materialized), then the provenance write and the
            # dedup+canonical write consume it as two concurrent tasks
            raw = materialize(
                rewrite_triples_raw(
                    triples, assignment_sel, subj_prefix="", id_col="doc_id"
                ).withColumn("part_id", _part_of("subj"))
            )
            write_tasks.append(
                lambda: sinks.write_partitioned(
                    raw, out_root, "canon_triples_raw", full_overwrite=True
                )
            )
            write_tasks.append(
                lambda: sinks.write_partitioned(
                    dedup_canonical_triples(raw),
                    out_root,
                    "triples_canonical",
                    full_overwrite=True,
                )
            )
        else:
            # provenance disabled: the plain single-join rewrite; any
            # previously-persisted provenance goes stale, and the
            # snapshot below carries no assignment hashes, so later
            # delta runs correctly refuse the partition-granular path
            canon_out = rewrite_triples(
                triples, assignment_sel, subj_prefix="", id_col="doc_id"
            ).withColumn("part_id", _part_of("subj"))
            write_tasks.append(
                lambda: sinks.write_partitioned(
                    canon_out, out_root, "triples_canonical",
                    full_overwrite=True,
                )
            )

        if provenance:
            # persist the assignment for the NEXT run's diff —
            # wholesale on the full-rewrite path, affected parts only
            # on the partition-granular and composed paths (a
            # composed run's assignment provably changed only in
            # affected_src parts, even when the TRIPLE rewrite
            # scatter-gated to a full overwrite)
            partial_state = canon_written_parts is not None or composed
            if composed:
                assign_out = (
                    assign_parted.where(
                        F.col("part_id").isin(
                            [int(p) for p in affected_src]
                        )
                    ).select("doc_id", "canonical_id", "part_id")
                )
            else:
                assign_out = assignment_sel.withColumn(
                    "part_id", _part_of("doc_id")
                )
                if partial_state:
                    assign_out = assign_out.where(
                        F.col("part_id").isin(
                            [int(p) for p in affected_src]
                        )
                    )
            state_tasks.append(
                lambda: sinks.write_partitioned(
                    assign_out, out_root, "canon_assignment",
                    full_overwrite=not partial_state,
                )
            )
            # per-doc text hashes for the NEXT run's doc-granular
            # content diff — narrow (two longs + id), pruned by part
            if partial_state:
                doc_h_out = new_doc_h.withColumn(
                    "part_id", _part_of("doc_id")
                )
            else:
                doc_h_out = docs.select(
                    "doc_id", F.xxhash64("text").alias("h")
                ).withColumn("part_id", _part_of("doc_id"))
            state_tasks.append(
                lambda: sinks.write_partitioned(
                    doc_h_out, out_root, "canon_doc_hash",
                    full_overwrite=not partial_state,
                )
            )

    # Commit the deferred writes on concurrent driver threads: the
    # jobs overlap on the executor pool and, more importantly at small
    # per-table sizes, their serial driver-side parquet commit
    # bookkeeping overlaps too (same pattern as run_media_phase).
    # TWO WAVES, not one: the diff-state tables (canon_assignment /
    # canon_doc_hash) must land strictly AFTER every output table — a
    # run that crashes mid-output must leave the OLD diff state in
    # force so the rerun recomputes the same change set (a completed
    # state write beside a crashed output write would make the rerun
    # see "nothing changed" over stale outputs).
    def _run_wave(tasks: list) -> None:
        if not tasks:
            return
        with ThreadPoolExecutor(max_workers=min(5, len(tasks))) as _pool:
            for _fut in [_pool.submit(t) for t in tasks]:
                _fut.result()

    _lap("rewrite_plan")
    _run_wave(write_tasks)
    _lap("write_outputs")
    # clear partitions the incremental rewrite emptied — after the
    # output writes (so the dynamic overwrites cannot resurrect them)
    # and BEFORE the state wave (an output mutation that must not be
    # certified by new diff state if we crash in between)
    for p in emptied_parts:
        for tbl in ("canon_triples_raw", "triples_canonical"):
            d = os.path.join(out_root, tbl, f"part_id={p}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    for p in ent_emptied:
        d = os.path.join(out_root, "entities", f"part_id={p}")
        if os.path.isdir(d):
            shutil.rmtree(d)
    _run_wave(state_tasks)
    # Ghost-part state cleanup (ADVICE r5, medium): a deletion that
    # emptied an entire pages_text part leaves that part's rows in the
    # doc-keyed state tables forever — the dynamic state writes above
    # have zero rows for it (nothing to overwrite with), the emptied-
    # part rmtrees cover only the output tables, and once the new
    # snapshot stops covering the part nothing ever touches it again.
    # A later composed run reads the full canon_assignment, so a
    # touched component would resurrect the deleted docs into
    # entities/assignment — an RTBF leak. The vanished parts are
    # exactly snapshot-minus-disk; clear their part dirs here, after
    # the state wave (idempotent, crash-safe: a rerun recomputes the
    # same set until the new snapshot lands).
    for p in sorted(snap_parts - parts_on_disk):
        for tbl in ("canon_signatures", "canon_assignment", "canon_doc_hash"):
            d = os.path.join(out_root, tbl, f"part_id={p}")
            if os.path.isdir(d):
                shutil.rmtree(d)
    _lap("write_state")

    # commit accounting: ONE job over the three just-written tables
    # (tagged union) + ONE manifest write — vs 3+3 serial driver
    # round-trips, which at small per-table sizes are pure fixed cost.
    # On the incremental-rewrite path triples_canonical counts only
    # the REWRITTEN partitions (partition-pruned read): untouched
    # parts keep their prior manifest rows, and latest-per-part wins.
    prior_triple_counts: dict[int, int] = {}
    if canon_written_parts is not None:
        latest: dict[int, tuple] = {}
        for m in sinks._manifest_rows(spark, out_root, "triples_canonical"):
            if m["status"] != "committed":
                continue
            key = (m["committed_at"], m["run_id"])
            p = int(m["part_id"])
            if p not in latest or key > latest[p][0]:
                latest[p] = (key, int(m["rows_out"]))
        prior_triple_counts = {p: n for p, (_, n) in latest.items()}
    stats = None
    for tbl in ["edges", "entities", "triples_canonical"]:
        if not _partition_ids(out_root, tbl):
            # zero-row table (e.g. no near-dup edge cleared the
            # threshold): the static overwrite wrote no data files, so
            # there is neither a schema to read nor a partition to
            # commit — the directory listing IS the emptiness check,
            # same as the extract phase's guard
            continue
        t = sinks.read_table(spark, out_root, tbl)
        if tbl == "triples_canonical" and canon_written_parts is not None:
            if not canon_written_parts:
                continue  # delta run touched no canonical partition
            t = t.where(F.col("part_id").isin(canon_written_parts))
        if tbl == "entities" and ent_written_parts is not None:
            if not ent_written_parts:
                continue
            t = t.where(F.col("part_id").isin(ent_written_parts))
        g = (
            t.groupBy("part_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(tbl).alias("tbl"), "part_id", "n")
        )
        stats = g if stats is None else stats.unionByName(g)
    rows = stats.collect() if stats is not None else []
    _lap("accounting")
    # snapshot for the NEXT incremental run: per-part state tokens +
    # the parameter hash, appended AFTER the outputs above so a crash
    # mid-phase leaves the old snapshot in force and the rerun simply
    # redoes the same delta (idempotent overwrites). Only parts with
    # manifest evidence get a token; evidence-less parts stay
    # "changed" until an extract commit proves them stable.
    manifest_rows = [(r["tbl"], r["part_id"], r["n"]) for r in rows]
    # partitions the incremental rewrite emptied get an explicit 0-row
    # commit: latest-per-part totals and the zero-change integrity
    # check must both see them as legitimately empty, not stale
    manifest_rows.extend(
        ("triples_canonical", p, 0) for p in emptied_parts
    )
    manifest_rows.extend(("entities", p, 0) for p in ent_emptied)
    # tombstone commits for SHRINK: a static overwrite that produces
    # fewer partitions than the previous run (a deletion removed a
    # part's docs) leaves the vanished partition's old nonzero commit
    # as latest-per-part — committed_total would then exceed the disk
    # forever and the zero-change integrity check could never pass
    # again. Bounded: once tombstoned at 0 a part is skipped. The
    # IVM triples path is excluded (untouched parts legitimately keep
    # their prior rows; its emptied parts are handled just above).
    summ_out = sinks.manifest_summary(
        spark, out_root, ["edges", "entities", "triples_canonical"]
    )
    for tbl in ["edges", "entities", "triples_canonical"]:
        if tbl == "triples_canonical" and canon_written_parts is not None:
            continue
        if tbl == "entities" and ent_written_parts is not None:
            continue
        on_disk_now = set(_partition_ids(out_root, tbl))
        manifest_rows.extend(
            (tbl, p, 0)
            for p, n in summ_out[tbl]["part_totals"].items()
            if n > 0 and p not in on_disk_now
        )
    manifest_rows.append(
        (sinks.CANON_STATE_TABLE, -1, params_hash, sinks.CANON_PARAMS)
    )
    manifest_rows.extend(
        (sinks.CANON_STATE_TABLE, p, tok, sinks.CANON_COVERED)
        for p, tok in tokens_now.items()
        if p in parts_on_disk
    )
    manifest_rows.extend(
        (sinks.CANON_STATE_TABLE, p, h, sinks.CANON_ASSIGN)
        for p, h in assign_hashes.items()
    )
    sinks.append_manifest_multi(spark, out_root, run_id, manifest_rows)
    if rows:
        # per-partition lineage for the canonicalize outputs (north
        # rule: lineage + metrics on every materialized table, not
        # just triples); the reshingle rows record exactly which parts
        # paid the Arrow signature kernel this run — the delta path's
        # audit trail
        lineage = spark.createDataFrame(
            [
                (
                    int(r["part_id"]),
                    f"canonicalize:{r['tbl']}",
                    "rows_out",
                    float(r["n"]),
                )
                for r in rows
            ]
            + [
                (int(p), "canonicalize:reshingle", "reshingled", 1.0)
                for p in delta_parts
            ],
            "part_id int, stage string, metric string, value double",
        )
        sinks.append_lineage(spark, out_root, run_id, "canonicalize", lineage)
    counts = {t: 0 for t in ["edges", "entities", "triples_canonical"]}
    for r in rows:
        counts[r["tbl"]] += r["n"]
    n_edges = counts["edges"]
    n_entities = counts["entities"]
    n_triples = counts["triples_canonical"]
    if canon_written_parts is not None:
        # total = freshly counted rewritten parts + prior latest
        # commits for every untouched partition
        n_triples += sum(
            n
            for p, n in prior_triple_counts.items()
            if p not in set(canon_written_parts)
        )
    if ent_written_parts is not None:
        n_entities += sum(
            n
            for p, n in summ_out["entities"]["part_totals"].items()
            if p not in set(ent_written_parts)
        )
    return {
        "run_id": run_id,
        "n_entities": n_entities,
        "n_edges": n_edges,
        "n_canonical_triples": n_triples,
        "parts_total": len(parts_on_disk),
        "parts_reshingled": len(delta_parts),
        "delta": bool(delta_ok),
        "assignment": "composed" if composed else "full",
        "timings": _timings,
        "triples_parts_rewritten": (
            len(canon_written_parts)
            if canon_written_parts is not None
            else None
        ),
        "entities_parts_rewritten": (
            len(ent_written_parts)
            if ent_written_parts is not None
            else None
        ),
        "seconds": time.time() - t0,
    }


def _curation_flags(
    docs: DataFrame,
    min_tokens: int,
    max_rep_ratio: float,
    sample_fraction: float,
) -> DataFrame:
    """docs(part_id, url, lang, text) → same rows deduped + flagged
    (_quality_ok, _sampled). Pure built-ins — zero Python crossings
    (asserted in tests/test_plans.py); the min_by dedup aggregation is
    the only corpus shuffle."""
    from spinneret_spark.functions.text import tokens
    from spinneret_spark.operators.curation import sample_gate

    fp = docs.withColumn("fingerprint", F.md5("text"))
    # first-seen winner per fingerprint: the smallest url survives
    # (deterministic; matches streaming.stateful.first_seen's
    # contract). ONE min_by aggregation, not a winners semi-join —
    # the join form scans the corpus twice (agg branch + probe side)
    # and shuffles it twice; min_by reduces map-side to one candidate
    # row per (partition, fingerprint), so the corpus is scanned once
    # and only surviving candidates cross the wire.
    deduped = (
        fp.groupBy("fingerprint")
        .agg(
            F.min_by(
                F.struct("part_id", "url", "lang", "text"), F.col("url")
            ).alias("_w"),
            # group size rides along so the funnel can report the
            # phase's exact input count (sum of group sizes) from the
            # SAME aggregation — no separate count() job, and correct
            # on every root shape (manifest arithmetic can't be: batch
            # commit totals and streamed marker totals overlap on
            # mixed roots, and marker totals count per-DELIVERY on
            # streamed roots — a re-crawled url would inflate them)
            F.count(F.lit(1)).alias("_n_dups"),
        )
        .select("fingerprint", "_n_dups", "_w.*")
    )
    # quality signals INLINE (textstats.quality_score's exact
    # expressions) — a join back onto a quality projection would
    # re-evaluate the dedup branch and shuffle the corpus twice more
    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    rep = F.lit(1.0) - F.size(F.array_distinct(toks)) / n_tok
    return deduped.select(
        "part_id",
        "url",
        "lang",
        "text",
        "fingerprint",
        "_n_dups",
        ((n_tok >= min_tokens) & (rep <= max_rep_ratio)).alias(
            "_quality_ok"
        ),
        sample_gate(F.col("url"), sample_fraction).alias("_sampled"),
    )


def run_curation_phase(
    spark: SparkSession,
    out_root: str,
    run_id: str,
    buckets: int = DEFAULT_BUCKETS,
    min_tokens: int = 5,
    max_rep_ratio: float = 0.98,
    sample_fraction: float = 1.0,
    pack_budget: int = 4096,
) -> dict:
    """Whole-corpus training-data curation over ``pages_text``:
    exact dedup (first-seen per content fingerprint) → quality gate
    (token floor + repetition ceiling) → deterministic hash sample →
    concat-and-chunk packing → the ``pages_curated`` table, committed
    with the same manifest + per-stage lineage contract as every
    other table.

    Plan shape: ONE pass computes every gate (the min_by dedup
    aggregation is the only shuffle before packing), one aggregate
    job reports
    the funnel (rows surviving each stage — the numbers a curation
    run is judged by), and the survivors flow into
    :func:`curation.pack_sequences`'s two-phase prefix sum. All
    built-ins — the phase never crosses into Python.
    """
    from spinneret_spark.operators.curation import pack_sequences

    t0 = time.time()
    empty = {
        "run_id": run_id,
        "n_in": 0,
        "n_after_dedup": 0,
        "n_after_quality": 0,
        "n_curated": 0,
        "n_chunks": 0,
        "seconds": 0.0,
    }
    if not _partition_ids(out_root, "pages_text"):
        empty["seconds"] = time.time() - t0
        return empty
    # same durable view as canonicalize: streamed pages are curated
    # alongside batch pages; orphans/replays stay invisible. Where
    # tagged streamed files survive, a url delivered by both paths
    # curates once — non-null text beats null (a failed re-crawl
    # extraction must not evict a good page: struct ordering sorts
    # NULL first, so the key leads with the null flag), then
    # deterministic min by (text, lang), matching canonicalize's
    # null-skipping F.min winner. Pure-batch corpora — including
    # roots whose streamed files a covering overwrite consumed —
    # skip the extra shuffle entirely.
    pt = sinks.manifest_summary(spark, out_root, ["pages_text"])["pages_text"]
    docs, has_streamed = sinks.read_durable_tagged(
        spark,
        out_root,
        "pages_text",
        markers=pt["markers"],
        evidence=pt["stream_evidence"],
    )
    docs = docs.select("part_id", "url", "lang", "text")
    if has_streamed:
        docs = (
            docs.groupBy("url")
            .agg(
                F.min_by(
                    F.struct("part_id", "lang", "text"),
                    F.struct(
                        F.col("text").isNull().alias("tnull"),
                        "text",
                        "lang",
                    ),
                ).alias("_w")
            )
            .select("_w.part_id", "url", "_w.lang", "_w.text")
        )
    # NO checkpoint here: the funnel aggregate and the pack/write job
    # share the dedup shuffle's stage output (Spark reuses shuffle
    # files across jobs on the same lineage — the second job's
    # upstream stages show as skipped), so the corpus text is never
    # materialized to the block store just to be read twice
    flagged = _curation_flags(docs, min_tokens, max_rep_ratio,
                              sample_fraction)

    # n_in (rows entering the phase — the durable reconciled view this
    # phase actually curates) comes out of the SAME funnel job as the
    # other stage counts: the dedup aggregation carries each
    # fingerprint's group size, and their sum is exactly docs.count()
    # without a second corpus scan. This replaced the manifest
    # arithmetic (round-4 ADVICE): commit totals and marker totals
    # can't be safely combined on mixed roots, and marker totals count
    # per-delivery (a url re-streamed in a later micro-batch inflates
    # them) — the in-job sum is exact on every root shape for free.
    funnel = flagged.agg(
        F.sum("_n_dups").alias("n_in"),
        F.count(F.lit(1)).alias("after_dedup"),
        F.sum(F.col("_quality_ok").cast("long")).alias("after_quality"),
        F.sum(
            (F.col("_quality_ok") & F.col("_sampled")).cast("long")
        ).alias("curated"),
    ).first()
    n_in = int(funnel["n_in"] or 0)

    kept = flagged.where(F.col("_quality_ok") & F.col("_sampled")).drop(
        "_quality_ok", "_sampled", "_n_dups"
    )
    # payload rides THROUGH the pack's range exchange — attaching
    # chunk ids via a join back on url would shuffle the text again
    curated = pack_sequences(
        kept.withColumn("_cost", F.length("text")),
        budget=pack_budget,
        cost_col="_cost",
        id_col="url",
        payload_cols=["part_id", "lang", "text", "fingerprint"],
    ).select(
        "part_id", "url", "lang", "text", "fingerprint",
        "chunk_id", "n_chunks",
    )
    sinks.write_partitioned(curated, out_root, "pages_curated",
                            full_overwrite=True)

    n_chunks = 0
    parts = []
    if _partition_ids(out_root, "pages_curated"):
        written = sinks.read_table(spark, out_root, "pages_curated")
        parts = written.groupBy("part_id").agg(
            F.count(F.lit(1)).alias("n"),
            (F.max(F.col("chunk_id") + F.col("n_chunks"))).alias("mx"),
        ).collect()
        sinks.append_manifest(
            spark, out_root, run_id, "pages_curated",
            [(r["part_id"], r["n"]) for r in parts],
        )
        n_chunks = max((r["mx"] for r in parts), default=0)
    # funnel lineage is UNCONDITIONAL: an empty-output run (e.g.
    # sample_fraction=0) still computed the funnel, and "this run
    # curated 0 of N rows" is exactly the record an operator needs
    funnel_rows = [
        (-1, "curate:input", "rows", float(n_in)),
        (-1, "curate:dedup", "rows", float(funnel["after_dedup"])),
        (-1, "curate:quality", "rows", float(funnel["after_quality"])),
        (-1, "curate:sample", "rows", float(funnel["curated"])),
        (-1, "curate:pack", "chunks", float(n_chunks)),
    ] + [
        (int(r["part_id"]), "curate:write", "rows_out", float(r["n"]))
        for r in parts
    ]
    sinks.append_lineage(
        spark,
        out_root,
        run_id,
        "pages_curated",
        spark.createDataFrame(
            funnel_rows,
            "part_id int, stage string, metric string, value double",
        ),
    )
    return {
        "run_id": run_id,
        "n_in": n_in,
        "n_after_dedup": funnel["after_dedup"],
        "n_after_quality": funnel["after_quality"],
        "n_curated": funnel["curated"],
        "n_chunks": int(n_chunks),
        "seconds": time.time() - t0,
    }


def run_media_phase(
    spark: SparkSession,
    media: DataFrame,
    out_root: str,
    run_id: str,
    buckets: int = DEFAULT_BUCKETS,
    min_width: int = 64,
    min_height: int = 64,
    max_duration_ms: int = 60_000,
) -> dict:
    """Multimodal curation gate: media (media_id, kind, blob) →
    header decode → resolution/duration filters → the ``media_meta``
    (all rows + decoded fields) and ``media_curated`` (survivors)
    tables, with the same manifest + funnel-lineage contract as the
    text curation phase.

    Plan shape: the blob crosses into Python EXACTLY once (the Arrow
    header-decode kernel in multimodal.extract_media_meta); every gate
    is a JVM-side filter over the decoded metadata, and the curated
    table carries METADATA ONLY — at 100 TB you don't copy media bytes
    a second time to record a keep/drop decision; consumers semi-join
    blobs back by media_id.
    """
    from spinneret_spark.operators.multimodal import extract_media_meta

    t0 = time.time()
    meta = extract_media_meta(media).withColumn(
        "part_id", F.pmod(F.xxhash64("media_id"), F.lit(buckets)).cast("int")
    )
    # decoded (= recognized container) iff a header field materialized;
    # gates are kind-dispatched: resolution floor for images, duration
    # ceiling for audio
    decoded = F.col("width").isNotNull() | F.col("duration_ms").isNotNull()
    keep = decoded & (
        F.when(
            F.col("width").isNotNull(),
            (F.col("width") >= min_width) & (F.col("height") >= min_height),
        ).otherwise(F.col("duration_ms") <= max_duration_ms)
    )
    flagged = materialize(meta.withColumn("_keep", keep))
    # one kernel run feeds both tables (the decode is the expensive
    # pass; everything after reads the materialized rows)

    # both writes read the checkpointed blocks and go to DIFFERENT
    # paths, so they run as CONCURRENT jobs from two driver threads:
    # each parquet write ends in a driver-serial commit (file moves,
    # _SUCCESS) that the builder's Amdahl fit measured at ~7 s of the
    # phase's serial fraction — overlapping the two jobs hides one
    # commit behind the other's compute instead of paying them
    # back-to-back (VERDICT r3 item 5)
    from concurrent.futures import ThreadPoolExecutor

    curated = flagged.where("_keep").drop("_keep")
    with ThreadPoolExecutor(max_workers=2) as pool:
        jobs = [
            pool.submit(
                sinks.write_partitioned,
                flagged.drop("_keep"),
                out_root,
                "media_meta",
                full_overwrite=True,
            ),
            pool.submit(
                sinks.write_partitioned,
                curated,
                out_root,
                "media_curated",
                full_overwrite=True,
            ),
        ]
        for j in jobs:
            j.result()  # re-raise either write's failure

    # commit accounting AND funnel in ONE tagged-union job over the
    # written tables + ONE manifest write. Driver-job fixed costs are
    # the phase's serial fraction — they cap N→4N efficiency on short
    # runs — so the per-part counts, decode counts, and keep counts
    # all come out of a single action; the funnel totals are
    # driver-side sums of the same rows.
    counts = None
    for tbl in ["media_meta", "media_curated"]:
        if not _partition_ids(out_root, tbl):
            continue
        g = (
            sinks.read_table(spark, out_root, tbl)
            .groupBy("part_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(decoded.cast("long")).alias("n_dec"),
            )
            .select(F.lit(tbl).alias("tbl"), "part_id", "n", "n_dec")
        )
        counts = g if counts is None else counts.unionByName(g)
    count_rows = counts.collect() if counts is not None else []
    manifest_rows = [(r["tbl"], r["part_id"], r["n"]) for r in count_rows]
    parts = [r for r in count_rows if r["tbl"] == "media_curated"]
    if manifest_rows:
        sinks.append_manifest_multi(spark, out_root, run_id, manifest_rows)
    n_in = sum(r["n"] for r in count_rows if r["tbl"] == "media_meta")
    n_decoded = sum(
        r["n_dec"] or 0 for r in count_rows if r["tbl"] == "media_meta"
    )
    n_kept = sum(r["n"] for r in parts)
    funnel_rows = [
        (-1, "media:input", "rows", float(n_in)),
        (-1, "media:decoded", "rows", float(n_decoded)),
        (-1, "media:kept", "rows", float(n_kept)),
    ] + [
        (int(r["part_id"]), "media:write", "rows_out", float(r["n"]))
        for r in parts
    ]
    sinks.append_lineage(
        spark,
        out_root,
        run_id,
        "media_curated",
        spark.createDataFrame(
            funnel_rows,
            "part_id int, stage string, metric string, value double",
        ),
    )
    return {
        "run_id": run_id,
        "n_in": int(n_in),
        "n_decoded": int(n_decoded),
        "n_kept": int(n_kept),
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
    jaccard_threshold: float = 0.8,
    canon_provenance: bool = True,
) -> dict:
    stats = run_extract_phase(spark, pages, out_root, run_id, buckets, terms)
    if canonicalize:
        stats["canonicalize"] = run_canonicalize_phase(
            spark,
            out_root,
            run_id,
            jaccard_threshold=jaccard_threshold,
            buckets=buckets,
            provenance=canon_provenance,
        )
    return stats
