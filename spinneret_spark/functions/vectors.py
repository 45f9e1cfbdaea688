"""Portable vector expressions over ``array<float>`` embedding columns.

All arithmetic is done in float64 after an explicit per-element cast,
folding left-to-right (F.aggregate), so a DuckDB oracle that folds the
same way reproduces the same IEEE doubles. Scores that cross a
comparison threshold in downstream filters are additionally rounded to
ROUND_DIGITS to absorb any engine-level reassociation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ROUND_DIGITS = 4


def _d(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right float64 dot product."""
    return F.aggregate(
        F.zip_with(_d(a), _d(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_d(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str) -> str:
    """DuckDB SQL: same left-to-right float64 fold."""
    prods = (
        f"list_transform(list_zip(list_transform({a}, x -> x::DOUBLE), "
        f"list_transform({b}, x -> x::DOUBLE)), p -> p[1] * p[2])"
    )
    return f"list_reduce(list_prepend(0.0::DOUBLE, {prods}), (acc, v) -> acc + v)"


def norm_sql(a: str) -> str:
    sq = f"list_transform({a}, x -> x::DOUBLE * x::DOUBLE)"
    return f"sqrt(list_reduce(list_prepend(0.0::DOUBLE, {sq}), (acc, v) -> acc + v))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
