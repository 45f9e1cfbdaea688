"""Connected-components property tests: chains, stars, cliques,
isolated nodes, and convergence (SURVEY.md §5.2-4)."""

from __future__ import annotations

from spinneret_spark.operators.components import (
    components_with_isolated,
    connected_components,
)


def _assign(spark, nodes, edges):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = components_with_isolated(ndf, edf)
    return dict((r["node"], r["component"]) for r in out.collect())


def test_chain(spark):
    got = _assign(spark, range(6), [(0, 1), (1, 2), (2, 3), (4, 5)])
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_star(spark):
    got = _assign(spark, range(5), [(4, 0), (4, 1), (4, 2), (4, 3)])
    assert set(got.values()) == {0}


def test_two_cliques_with_bridge(spark):
    cliq1 = [(a, b) for a in range(3) for b in range(3) if a < b]
    cliq2 = [(a, b) for a in range(10, 13) for b in range(10, 13) if a < b]
    got = _assign(spark, list(range(3)) + list(range(10, 13)), cliq1 + cliq2)
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}
    # now bridge them
    got = _assign(
        spark, list(range(3)) + list(range(10, 13)), cliq1 + cliq2 + [(2, 10)]
    )
    assert set(got.values()) == {0}


def test_isolated_nodes_self_component(spark):
    got = _assign(spark, range(4), [(0, 1)])
    assert got == {0: 0, 1: 0, 2: 2, 3: 3}


def test_long_chain_converges(spark):
    n = 24
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _assign(spark, range(n), edges)
    assert set(got.values()) == {0}


def test_edge_only_nodes(spark):
    edf = spark.createDataFrame([(7, 8), (8, 9)], "src long, dst long")
    out = connected_components(edf)
    got = dict((r["node"], r["component"]) for r in out.collect())
    assert got == {7: 7, 8: 7, 9: 7}


def test_mega_star_with_hot_split(spark):
    """A giant star (one component-minimum with 2000 direct neighbors)
    exercises the broadcast hot-key path (hot_threshold=100) and must
    not change the answer."""
    edf = spark.createDataFrame(
        [(0, i) for i in range(1, 2000)], "src long, dst long"
    )
    ndf = spark.createDataFrame([(i,) for i in range(2000)], "node long")
    out = components_with_isolated(ndf, edf, hot_threshold=100)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}


def test_long_chain_log_rounds(spark):
    """Large-star/small-star needs O(log d) rounds: a 64-node chain
    (diameter 63) must converge well inside 12 rounds — min-label
    would need 63."""
    n = 64
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    out = connected_components(edf, max_iter=12)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_nonconvergence_raises(spark):
    """max_iter too low must raise, never silently emit split
    components (ADVICE round 1)."""
    import pytest as _pytest

    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(23)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, max_iter=1)
