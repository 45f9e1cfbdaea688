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

    def kernel(batches):
        # mapInArrow + columnar assembly: the html binary column stays
        # an Arrow buffer until each cell's one .as_py() copy
        # (mapInPandas' Series-of-objects conversion alone cost ~7 s
        # of the 100k-doc run), per-doc value lists are extended into
        # batch-wide columns, and the seven constant annotation slots
        # are materialized once per batch — building 2.4M row dicts
        # and letting pandas pivot them cost more than the XML walks
        import pyarrow as pa

        from spinneret_spark.extract.emlmeta import (
            extract_workbook_columns,
        )

        out_schema = pa.schema([(c, pa.string()) for c in _OUT_COLUMNS])
        for rb in batches:
            col = rb.column(0)
            pkg_c: list[str] = []
            url_c: list[str] = []
            el_c: list[str] = []
            xp_c: list[str] = []
            ctx_c: list[str] = []
            subj_c: list[str] = []
            for blob in col:
                b = blob.as_py()
                if b is None:
                    continue
                pkg, url, els, xps, ctxs, subjs = extract_workbook_columns(
                    b, elements, base_url
                )
                n = len(els)
                if not n:
                    continue
                pkg_c.extend([pkg] * n)
                url_c.extend([url] * n)
                el_c.extend(els)
                xp_c.extend(xps)
                ctx_c.extend(ctxs)
                subj_c.extend(subjs)
            blank = [""] * len(el_c)
            arrays = [
                pa.array(vals, type=pa.string())
                for vals in (
                    pkg_c, url_c, el_c, xp_c, ctx_c, subj_c,
                    blank, blank, blank, blank, blank, blank, blank,
                )
            ]
            yield pa.RecordBatch.from_arrays(arrays, schema=out_schema)

    extracted = pages.select("html").mapInArrow(kernel, schema=WORKBOOK_SCHEMA)
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
