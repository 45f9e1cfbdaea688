"""Physical-plan introspection (SURVEY.md §4.2 obligations).

These helpers parse ``df.explain("formatted")`` output so tests can
assert scale-critical properties instead of eyeballing plans:

* filters reached the parquet scan (``PushedFilters``);
* the dictionary join is a BroadcastHashJoin, not a shuffle join;
* the number of shuffles (``Exchange`` nodes) matches the budget;
* the number of JVM↔Python crossings (ArrowEvalPython / MapInPandas
  nodes) matches the fused-UDF design.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges only. In formatted plans a shuffle prints as
    a bare ``Exchange`` node (``\\bExchange\\b`` cannot match inside
    ``BroadcastExchange`` — no word boundary there); each node appears
    once in the tree and once in the detail listing, hence the /2."""
    plan = formatted_plan(df)
    tree = plan.split("\n\n")[0]
    return len(re.findall(r"\bExchange\b", tree))


def has_cartesian(df: DataFrame) -> bool:
    """True if the plan contains a cross (pair) join — either a
    CartesianProduct or a BroadcastNestedLoopJoin planned for a Cross
    join type. Callers asserting an operator's pair join is blocked
    should cut upstream lineage first (localCheckpoint) so a
    deliberate tiny-side cross (e.g. k-row centroid argmax) upstream
    doesn't trip the check."""
    plan = formatted_plan(df)
    return "CartesianProduct" in plan or bool(
        re.search(r"BroadcastNestedLoopJoin\s+Cross", plan)
    )


def count_python_crossings(df: DataFrame) -> int:
    tree = formatted_plan(df).split("\n\n")[0]
    return len(
        re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", tree)
    )
