"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The kg_pipeline entry is the north-rule metric: end-to-end
extract→detect→link→triples (+ canonicalization) over a generated
pages corpus of $SPARK_GRAFT_BENCH_PAGES (default 3000) pages;
pages/sec is reported alongside.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


HEADLINE = [
    "kg_triples",
    "kg_mentions",
    "kg_entity_degree",
    "q_pricing_summary",
    "q_segment_top_orders",
    "q_nation_revenue",
    "q_sessionize",
    "text_quality",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "ann_topk_cosine",
    "cc_components",
    "curate_sample_stratified",
    "curate_pack_sequences",
    "vocab_topk_tokens",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "3000"))

    import __spark_entry__ as entrymod
    from spinneret_spark import pipeline
    from spinneret_spark.session import get_spark
    from spinneret_spark.sources.corpusgen import generate_pages

    spark = get_spark(app_name="spinneret-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}

    # warm-up: JVM/codegen/Arrow paths
    qs["kg_mentions"](spark, sf_dir).count()

    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).count()
        timings[name] = round(time.time() - t0, 3)

    # end-to-end KG pipeline (north-rule metric)
    pages = generate_pages(spark, n_pages).cache()
    n = pages.count()  # materialize corpus outside the timed window
    out_root = os.path.join(tempfile.mkdtemp(prefix="bench_kg_"), "kg")
    t0 = time.time()
    pipeline.run(spark, pages, out_root, f"bench-{uuid.uuid4().hex[:8]}")
    kg_secs = time.time() - t0
    timings["kg_pipeline"] = round(kg_secs, 3)
    pages_per_sec = round(n / kg_secs, 2)

    # workbook.create at corpus scale: the reference flagship operator
    # over a 100k-document templated EML corpus through the parquet
    # pages path (corpus cached across rounds — generation excluded
    # from the timed window)
    from spinneret_spark.operators.workbook import create_workbook
    from spinneret_spark.sources.corpusgen import (
        _EML_BASE_URL,
        generate_eml_pages,
    )

    n_eml = int(os.environ.get("SPARK_GRAFT_BENCH_EML_DOCS", "100000"))
    eml_path = os.path.join(
        tempfile.gettempdir(), f"spinneret_bench_eml_{n_eml}"
    )
    # _SUCCESS is the completeness marker: a crashed prior generation
    # leaves a partial dir that would silently shrink the benchmark
    if not os.path.isfile(os.path.join(eml_path, "_SUCCESS")):
        generate_eml_pages(spark, n_eml, num_partitions=64).write.mode(
            "overwrite"
        ).parquet(eml_path)
    eml_pages = spark.read.parquet(eml_path)
    t0 = time.time()
    wb_rows = create_workbook(
        eml_pages,
        ["dataset", "dataTable", "otherEntity", "attribute"],
        _EML_BASE_URL,
    ).count()
    wb_secs = time.time() - t0
    timings["workbook_100k"] = round(wb_secs, 3)

    # multimodal curation phase: header decode + gates over a synthetic
    # media corpus (generation cached outside the timed window)
    from spinneret_spark.sources.mediagen import generate_media

    n_media = int(os.environ.get("SPARK_GRAFT_BENCH_MEDIA_DOCS", "20000"))
    media = generate_media(spark, n_media, num_partitions=32).cache()
    media.count()
    media_root = os.path.join(tempfile.mkdtemp(prefix="bench_media_"), "m")
    t0 = time.time()
    pipeline.run_media_phase(
        spark, media, media_root, f"bench-{uuid.uuid4().hex[:8]}"
    )
    timings["media_phase"] = round(time.time() - t0, 3)
    media.unpersist()

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline query suite + end-to-end KG pipeline "
        "(extract->link->triples->canonicalize)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir,
        "pages": n,
        "pages_per_sec": pages_per_sec,
        "workbook_docs": n_eml,
        "workbook_rows": wb_rows,
        "workbook_docs_per_sec": round(n_eml / wb_secs, 1),
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
