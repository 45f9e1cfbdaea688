"""Incremental skin over the batch pipeline.

The north rule requires resumability, not streaming (SURVEY.md §2.10)
— the batch pipeline checkpoints per input partition. This module
adds the optional Structured-Streaming face: the same per-batch
function runs under ``foreachBatch``, so a pages table that grows
(new crawl snapshots landing as files) is processed incrementally
with Spark's own checkpoint tracking which files were consumed.
"""

from spinneret_spark.streaming.incremental import stream_pages_to_triples

__all__ = ["stream_pages_to_triples"]
