"""Distributed annotation-workbook construction.

Spark-native equivalent of the reference entry point
``workbook.create(eml, elements, base_url, path_out)``
(/root/reference/src/spinneret/workbook.py:8-97). Differences are
architectural, not semantic:

* the corpus is a DataFrame of pages ``(url, warc_ts, html, text,
  lang)`` (BASELINE.json:15), not a directory listing — the reference's
  per-file loop (workbook.py:90-93) becomes one distributed scan;
* per-document extraction runs inside ``mapInPandas`` (one Arrow
  crossing, whole partition streamed batch-wise) instead of eager
  lxml; the one-to-many xpath scan (workbook.py:124-125) is the
  flatMap inside the kernel, so no explode shuffle is needed;
* the union-all ``pd.concat`` (workbook.py:93) disappears — partitions
  are already one logical relation;
* ``element_id`` stays a nondeterministic uuid per row
  (workbook.py:131 semantics, excluded from golden comparison exactly
  as the reference's own test does at tests/test_workbook.py:29), and
  a deterministic twin ``det_id = sha2(url#element_xpath#element)``
  is added for checkpoint/resume idempotency (SURVEY.md §1.2).

Scale notes: input is pruned to the single fat column ``html`` before
the Python crossing (column pruning reaches the parquet scan); the
plan is narrow end-to-end — zero shuffles until the sink.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

from spinneret_spark.extract.emlmeta import extract_workbook_rows

#: Valid ``elements`` values (reference docstring workbook.py:16-19).
VALID_ELEMENTS = [
    "dataset",
    "dataTable",
    "otherEntity",
    "spatialVector",
    "spatialRaster",
    "storedProcedure",
    "view",
    "attribute",
]

#: Reference column order (workbook.py:144-159).
WORKBOOK_SCHEMA = StructType(
    [
        StructField("package_id", StringType()),
        StructField("url", StringType()),
        StructField("element", StringType()),
        StructField("element_xpath", StringType()),
        StructField("context", StringType()),
        StructField("subject", StringType()),
        StructField("predicate", StringType()),
        StructField("predicate_id", StringType()),
        StructField("object", StringType()),
        StructField("object_id", StringType()),
        StructField("author", StringType()),
        StructField("date", StringType()),
        StructField("comment", StringType()),
    ]
)

_OUT_COLUMNS = [f.name for f in WORKBOOK_SCHEMA.fields]


def create_workbook(
    pages: DataFrame,
    elements: list[str],
    base_url: str,
) -> DataFrame:
    """pages(html,...) → 14-column workbook DataFrame (+ det_id).

    ``elements`` and ``base_url`` as in the reference
    (workbook.py:13-25). Rows arrive in no particular order —
    the reference's own golden test is order-insensitive
    (tests/test_workbook.py:30), so bag semantics are declared.
    """
    unknown = [e for e in elements if e not in VALID_ELEMENTS]
    if unknown:
        raise ValueError(f"unknown elements: {unknown}; valid: {VALID_ELEMENTS}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for blob in pdf["html"]:
                if blob is None:
                    continue
                out.extend(
                    extract_workbook_rows(bytes(blob), elements, base_url)
                )
            yield pd.DataFrame(out, columns=_OUT_COLUMNS)

    extracted = pages.select("html").mapInPandas(kernel, schema=WORKBOOK_SCHEMA)
    return extracted.select(
        "package_id",
        "url",
        "element",
        # uuid4-per-row presentation id (workbook.py:131); nondeterministic
        # by contract, excluded from comparisons like the reference does.
        F.expr("uuid()").alias("element_id"),
        "element_xpath",
        "context",
        "subject",
        "predicate",
        "predicate_id",
        "object",
        "object_id",
        "author",
        "date",
        "comment",
        # deterministic twin for resume/scoring (SURVEY.md P6)
        F.sha2(F.concat_ws("#", "url", "element_xpath", "element"), 256).alias(
            "det_id"
        ),
    )


def write_workbook_tsv(workbook: DataFrame, path_out: str) -> str:
    """Write-once TSV sink mirroring the reference's ``mode="x"``
    contract (workbook.py:96: never silently overwrite).

    Single-file TSV is a small-scale fixture-export convenience; the
    scale path is the partitioned parquet sink in
    :mod:`spinneret_spark.sinks.tables`.
    """
    target = path_out + "/annotation_workbook.tsv"
    (
        workbook.drop("det_id")
        .coalesce(1)
        .write.option("sep", "\t")
        .option("header", True)
        .mode("errorifexists")
        .csv(target)
    )
    return target
