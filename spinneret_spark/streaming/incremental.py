"""Structured-Streaming wrapper: file-source pages → triples sink.

``readStream`` over the pages directory (parquet file source; each
newly-landed file is a micro-batch) → the *identical* batch transform
(pipeline.pages_to_triples) inside ``foreachBatch`` → APPEND to the
partitioned triples table + manifest. Spark's streaming checkpoint
(``checkpointLocation``) records consumed files; the manifest keeps
the same commit semantics as the batch path.

Write-mode contract (the round-1 bug): micro-batches from different
triggers land in overlapping ``part_id=`` buckets, so the batch
path's dynamic-partition OVERWRITE would delete earlier batches'
rows wholesale — streaming must APPEND. Idempotence across the two
paths still holds at the manifest level: a part is "committed" once
any batch writes it, and the batch path's resume anti-join skips
committed parts, so batch and streaming runs interleave without
double-writing a part. (Exactly-once within streaming comes from the
streaming checkpoint: a replayed micro-batch re-runs foreachBatch,
which is why production deployments put the output in an
Iceberg/transactional table; the parquet fallback documents
at-least-once on crash-replay.)

Each batch is ``localCheckpoint()``-ed before the write: the fused
extract+detect kernel (the expensive Python pass) runs EXACTLY once
per micro-batch — the write and the manifest count both read the
materialized blocks instead of re-deriving the lineage.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from spinneret_spark import pipeline
from spinneret_spark.sinks import tables as sinks


def stream_pages_to_triples(
    spark: SparkSession,
    pages_path: str,
    out_root: str,
    checkpoint_dir: str,
    run_id: str,
    schema: str = (
        "page_id long, url string, warc_ts timestamp, html binary, "
        "text string, lang string"
    ),
    buckets: int = pipeline.DEFAULT_BUCKETS,
    trigger_once: bool = True,
    max_files_per_trigger: int = 8,
):
    """Start (and by default drain-once) the incremental pipeline.

    Returns the StreamingQuery. ``trigger_once`` processes all
    currently-available files then stops — the cron-friendly mode;
    set False for continuous micro-batching.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(pages_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = pipeline.pages_to_triples(
            pipeline.with_part_id(batch_df, buckets)
        ).localCheckpoint()  # extract+detect kernel runs ONCE per batch
        (
            triples.write.partitionBy("part_id")
            .mode("append")  # NEVER overwrite: batches share part_ids
            .parquet(os.path.join(out_root, "triples"))
        )
        # counts from the checkpointed blocks — no recompute
        parts = [
            (r["part_id"], r["n"])
            for r in triples.groupBy("part_id")
            .count()
            .withColumnRenamed("count", "n")
            .collect()
        ]
        if parts:
            sinks.append_manifest(
                spark, out_root, f"{run_id}-b{batch_id}", "triples", parts
            )

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
