"""Shared test fixtures: one local SparkSession per test session."""

from __future__ import annotations

import os

import pytest

from spinneret_spark.session import get_spark

REFERENCE_DIR = "/root/reference"
TESTDATA_SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="spinneret-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
    )
    yield session
    session.stop()


@pytest.fixture(scope="session")
def reference_eml_dir():
    d = os.path.join(REFERENCE_DIR, "src/spinneret/data/eml")
    if not os.path.isdir(d):
        pytest.skip("reference corpus not available")
    return d


@pytest.fixture(scope="session")
def golden_workbook_path():
    p = os.path.join(REFERENCE_DIR, "tests/annotation_workbook.tsv")
    if not os.path.isfile(p):
        pytest.skip("reference golden fixture not available")
    return p
