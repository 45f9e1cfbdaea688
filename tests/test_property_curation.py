"""Hypothesis property tests for sequence packing: the distributed
two-phase prefix sum vs a pure-Python reference over randomized cost
lists, budgets, and partition counts (boundary cases a fixed fixture
misses: zero-cost docs, budget=1, single row, costs straddling many
chunks)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from spinneret_spark.operators.curation import pack_sequences


def _reference(ids_costs, budget):
    out = {}
    start = 0
    for i, cost in sorted(ids_costs):
        chunk = start // budget
        end = (start + max(cost, 1) - 1) // budget
        out[i] = (cost, start, chunk, end - chunk + 1)
        start += cost
    return out


@settings(max_examples=8, deadline=None)
@given(
    costs=st.lists(st.integers(0, 5000), min_size=1, max_size=120),
    budget=st.integers(1, 4096),
    num_parts=st.integers(1, 7),
    data=st.data(),
)
def test_pack_matches_python_reference(spark, costs, budget, num_parts, data):
    # non-contiguous, shuffled ids: the operator must order by id
    # itself, not rely on input order
    ids = data.draw(
        st.permutations(list(range(0, 10 * len(costs), 10))[: len(costs)])
    )
    rows = list(zip(ids, costs))
    df = spark.createDataFrame(rows, "doc_id long, n_chars long").repartition(3)
    got = {
        r["doc_id"]: (r["cost"], r["start_off"], r["chunk_id"], r["n_chunks"])
        for r in pack_sequences(
            df, budget=budget, cost_col="n_chars", num_parts=num_parts
        ).collect()
    }
    assert got == _reference(rows, budget)
