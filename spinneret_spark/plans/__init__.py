"""Plan-audit helpers: assert the physical plans we designed for are
the plans we got (pushdown reached the scan, joins broadcast, UDF
crossings counted)."""

from spinneret_spark.plans.audit import (
    count_exchanges,
    count_python_crossings,
    formatted_plan,
    has_broadcast_join,
    has_cartesian,
    pushed_filters,
)

__all__ = [
    "formatted_plan",
    "pushed_filters",
    "has_broadcast_join",
    "has_cartesian",
    "count_exchanges",
    "count_python_crossings",
]
