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
