"""SimHash kernel-vs-expression bench (VERDICT r1 item 4): time both
fingerprint paths over an N-doc corpus, append the row to
BENCH/BASELINE.md."""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from spinneret_spark.operators.dedup import (
        simhash_fingerprints,
        simhash_fingerprints_pandas,
    )
    from spinneret_spark.session import get_spark
    from spinneret_spark.sources.corpusgen import generate_pages

    spark = get_spark(app_name="simhash-bench", master="local[32]",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        generate_pages(spark, n_docs, include_reference_eml=False)
        .select(F.col("url").alias("doc_id"), "text")
        .localCheckpoint()
    )
    # warm-up both paths on a slice
    small = docs.limit(2000).localCheckpoint()
    simhash_fingerprints(small, bits=16).count()
    simhash_fingerprints_pandas(small, bits=64).count()

    t0 = time.time()
    simhash_fingerprints(docs, bits=16).count()
    t_expr = time.time() - t0
    t0 = time.time()
    simhash_fingerprints_pandas(docs, bits=64).count()
    t_kernel = time.time() - t0
    line = (
        f"| {n_docs} docs | expression path (16-bit) {t_expr:.1f}s | "
        f"numpy kernel (64-bit) {t_kernel:.1f}s | kernel speedup "
        f"{t_expr / t_kernel:.2f}x at 4x the bit width |\n"
    )
    print(line)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
        fh.write(line)
    spark.stop()


if __name__ == "__main__":
    main()
