"""Golden parity: the Spark workbook pipeline must reproduce the
reference's annotation workbook on its own 3-document corpus with the
reference's own comparison semantics
(/root/reference/tests/test_workbook.py:9-30): per-column
distinct-value-set equality, NaN→"" normalization, the
nondeterministic ``element_id`` excluded, and
countDistinct(package_id) == 3 — plus a strict row-level P/R gate on
(subject, context, element_xpath) far above the mandated 0.95.
"""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

from spinneret_spark.operators.workbook import create_workbook, write_workbook_tsv

ELEMENTS = ["dataset", "dataTable", "otherEntity", "attribute"]
BASE_URL = "https://portal.edirepository.org/nis/metadataviewer?packageid="


@pytest.fixture(scope="module")
def pages(spark, reference_eml_dir):
    """Reference EML corpus shaped as the mandated pages table
    (url, warc_ts, html, text, lang) per BASELINE.json:15."""
    rows = []
    for name in sorted(os.listdir(reference_eml_dir)):
        with open(os.path.join(reference_eml_dir, name), "rb") as fh:
            blob = fh.read()
        rows.append(
            (
                "file://" + name,
                datetime.datetime(2024, 1, 1),
                bytearray(blob),
                "",
                "en",
            )
        )
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )


@pytest.fixture(scope="module")
def workbook_pdf(pages):
    return create_workbook(pages, ELEMENTS, BASE_URL).toPandas()


@pytest.fixture(scope="module")
def golden_pdf(golden_workbook_path):
    return pd.read_csv(golden_workbook_path, sep="\t").fillna("")


def test_row_count(workbook_pdf, golden_pdf):
    assert len(workbook_pdf) == len(golden_pdf) == 71


def test_distinct_package_ids(workbook_pdf):
    # reference assertion at tests/test_workbook.py:23
    assert workbook_pdf["package_id"].nunique() == 3


def test_per_column_distinct_sets(workbook_pdf, golden_pdf):
    # reference comparison at tests/test_workbook.py:27-30
    for c in golden_pdf.columns:
        if c == "element_id":
            continue
        got = sorted(workbook_pdf[c].fillna("").unique())
        want = sorted(golden_pdf[c].unique())
        assert got == want, f"column {c} distinct sets differ"


def test_row_level_precision_recall(workbook_pdf, golden_pdf):
    """Strict multiset P/R on the deterministic column tuple."""
    keys = ["package_id", "element", "element_xpath", "context", "subject"]
    got = set(map(tuple, workbook_pdf[keys].fillna("").values))
    want = set(map(tuple, golden_pdf[keys].values))
    tp = len(got & want)
    precision = tp / len(got)
    recall = tp / len(want)
    assert precision >= 0.95 and recall >= 0.95
    assert precision == 1.0 and recall == 1.0  # we actually hit exact


def test_element_id_unique_per_row(workbook_pdf):
    # uuid4 semantics from workbook.py:131
    assert workbook_pdf["element_id"].nunique() == len(workbook_pdf)


def test_det_id_deterministic(pages):
    a = create_workbook(pages, ELEMENTS, BASE_URL).select("det_id").toPandas()
    b = create_workbook(pages, ELEMENTS, BASE_URL).select("det_id").toPandas()
    assert sorted(a["det_id"]) == sorted(b["det_id"])
    assert len(set(a["det_id"])) == len(a)


def test_write_once_tsv(pages, tmp_path):
    """Reference mode="x" no-overwrite contract (workbook.py:96)."""
    wb = create_workbook(pages, ELEMENTS, BASE_URL)
    write_workbook_tsv(wb, str(tmp_path))
    with pytest.raises(Exception):
        write_workbook_tsv(wb, str(tmp_path))


def test_templated_eml_corpus_parity(spark):
    """generate_eml_pages templates the 3 reference docs: per-template
    row counts must match the golden corpus (27+25+19 = 71 rows per
    3 documents), with only package_id/url varying."""
    from spinneret_spark.operators.workbook import create_workbook
    from spinneret_spark.sources.corpusgen import (
        _EML_BASE_URL,
        generate_eml_pages,
    )

    pages = generate_eml_pages(spark, 30, num_partitions=4)
    wb = create_workbook(
        pages, ["dataset", "dataTable", "otherEntity", "attribute"],
        _EML_BASE_URL,
    )
    assert wb.count() == 10 * 71
    per_pkg = wb.groupBy("package_id").count().collect()
    assert len(per_pkg) == 30
    assert sorted({r["count"] for r in per_pkg}) == [19, 25, 27]
