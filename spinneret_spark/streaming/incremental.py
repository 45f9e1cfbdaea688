"""Structured-Streaming wrapper: file-source pages → triples sink.

``readStream`` over the pages directory (parquet file source; each
newly-landed file is a micro-batch) → the *identical* batch transform
(pipeline.pages_to_triples) inside ``foreachBatch`` → append to the
partitioned triples table + manifest. Spark's streaming checkpoint
(``checkpointLocation``) records consumed files; the manifest keeps
the same commit semantics as the batch path, so batch and streaming
runs interleave safely.
"""

from __future__ import annotations

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
):
    """Start (and by default drain-once) the incremental pipeline.

    Returns the StreamingQuery. ``trigger_once`` processes all
    currently-available files then stops — the cron-friendly mode;
    set False for continuous micro-batching.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_path)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        triples = pipeline.pages_to_triples(
            pipeline.with_part_id(batch_df, buckets)
        )
        sinks.write_partitioned(triples, out_root, "triples")
        parts = [
            (r["part_id"], r["n"])
            for r in triples.groupBy("part_id").count()
            .withColumnRenamed("count", "n").collect()
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
