"""SparkSession factory with the confs the pipeline relies on.

Tuning rationale (SURVEY.md §4.2):

* Arrow exchange on — every Python crossing is an Arrow batch
  (pandas UDFs), never pickled rows.
* Arrow batch size bounded — web pages carry multi-MB ``html``
  payloads; 10k-row default batches would balloon Python-worker
  memory at 100 TB scale.
* AQE + skew-join on — LSH band buckets and connected-components
  labels are power-law skewed; AQE splits skewed partitions at
  runtime and coalesces tiny ones after filters.
* Shuffle partitions sized for the local harness; on a real cluster
  this is set per-job from input bytes (see bench.py / BENCH docs).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "spinneret_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with pipeline confs applied."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html rows are MBs; bound Arrow batches so a Python worker
        # holds ~64-256 rows, not 10k (SURVEY.md §4.2).
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "256")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    # optional tmpfs shuffle dir (bench runs): local[k] shuffles are
    # disk-bound long before they are CPU-bound on one machine
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
