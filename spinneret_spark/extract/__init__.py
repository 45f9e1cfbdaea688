"""Pure-Python deterministic extractors.

These functions are the per-document kernels executed inside
Arrow-vectorized pandas UDFs (SURVEY.md §2.9 U1-U3). They hold no
Spark state and are unit-testable without a SparkSession.
"""

from spinneret_spark.extract.emlmeta import extract_workbook_rows, WORKBOOK_COLUMNS
from spinneret_spark.extract.htmltext import extract_text

__all__ = ["extract_workbook_rows", "WORKBOOK_COLUMNS", "extract_text"]
