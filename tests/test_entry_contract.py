"""Driver-contract guard rails for ``__spark_entry__.py``.

The driver's oracle harness canonicalizes each result via pandas
``sort_values`` before value-hashing; list/struct/map-typed cells are
unhashable there (CORRECTNESS_r02: ``kg_entity_rollup`` err). Rule:
every ``queries()`` entry must return SCALAR-only columns, and every
entry that claims full correctness must have an ``oracle_sql()`` twin.

Schema resolution is lazy (``df.schema`` analyzes the plan without
running a job), so this suite stays cheap even over all 35 queries.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

import __spark_entry__ as entrymod
from tests.conftest import TESTDATA_SF

_COMPLEX = (ArrayType, MapType, StructType)


def _query_items():
    return sorted(entrymod.queries().items())


@pytest.mark.parametrize("name,fn", _query_items(), ids=[n for n, _ in _query_items()])
def test_query_schema_is_scalar_only(spark, name, fn):
    df = fn(spark, TESTDATA_SF)
    bad = [
        f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)
    ]
    assert not bad, (
        f"{name} returns non-scalar columns {bad}; the driver harness "
        "cannot canonicalize them — stringify (concat_ws / to_json)"
    )


def test_every_query_has_an_oracle_or_is_documented():
    """Every queries() key must appear in oracle_sql(); exceptions must
    be listed here explicitly so a new rows-only query is a conscious
    decision, not an accident."""
    rows_only_allowed: set[str] = set()  # none since round 3
    missing = set(entrymod.queries()) - set(entrymod.oracle_sql()) - rows_only_allowed
    assert not missing, f"queries without an oracle: {sorted(missing)}"
    dangling = set(entrymod.oracle_sql()) - set(entrymod.queries())
    assert not dangling, f"oracle entries without a query: {sorted(dangling)}"
