"""Connected-components property tests: chains, stars, cliques,
isolated nodes, and convergence (SURVEY.md §5.2-4). Parametrized over
BOTH execution paths — the driver union-find fast path (small edge
lists) and the distributed large-star/small-star loop (forced via
small_graph_threshold=0) — which must agree everywhere."""

from __future__ import annotations

import random

import pytest

from spinneret_spark.operators.components import (
    components_with_isolated,
    connected_components,
)

LOOP = 0  # force the distributed large-star/small-star loop
FAST = 100_000  # default: small graphs take the driver union-find


@pytest.fixture(params=[LOOP, FAST], ids=["distributed", "union-find"])
def threshold(request):
    return request.param


def _assign(spark, nodes, edges, threshold):
    ndf = spark.createDataFrame([(n,) for n in nodes], "node long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    out = components_with_isolated(
        ndf, edf, small_graph_threshold=threshold
    )
    return dict((r["node"], r["component"]) for r in out.collect())


def test_chain(spark, threshold):
    got = _assign(
        spark, range(6), [(0, 1), (1, 2), (2, 3), (4, 5)], threshold
    )
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4}


def test_star(spark, threshold):
    got = _assign(
        spark, range(5), [(4, 0), (4, 1), (4, 2), (4, 3)], threshold
    )
    assert set(got.values()) == {0}


def test_two_cliques_with_bridge(spark, threshold):
    cliq1 = [(a, b) for a in range(3) for b in range(3) if a < b]
    cliq2 = [(a, b) for a in range(10, 13) for b in range(10, 13) if a < b]
    nodes = list(range(3)) + list(range(10, 13))
    got = _assign(spark, nodes, cliq1 + cliq2, threshold)
    assert {got[0], got[1], got[2]} == {0}
    assert {got[10], got[11], got[12]} == {10}
    # now bridge them
    got = _assign(spark, nodes, cliq1 + cliq2 + [(2, 10)], threshold)
    assert set(got.values()) == {0}


def test_isolated_nodes_self_component(spark, threshold):
    got = _assign(spark, range(4), [(0, 1)], threshold)
    assert got == {0: 0, 1: 0, 2: 2, 3: 3}


def test_long_chain_converges(spark, threshold):
    n = 24
    edges = [(i, i + 1) for i in range(n - 1)]
    got = _assign(spark, range(n), edges, threshold)
    assert set(got.values()) == {0}


def test_edge_only_nodes(spark, threshold):
    edf = spark.createDataFrame([(7, 8), (8, 9)], "src long, dst long")
    out = connected_components(edf, small_graph_threshold=threshold)
    got = dict((r["node"], r["component"]) for r in out.collect())
    assert got == {7: 7, 8: 7, 9: 7}


def test_mega_star_with_hot_split(spark):
    """A giant star (one component-minimum with 2000 direct neighbors)
    exercises the broadcast hot-key path (hot_threshold=100) of the
    DISTRIBUTED loop and must not change the answer."""
    edf = spark.createDataFrame(
        [(0, i) for i in range(1, 2000)], "src long, dst long"
    )
    ndf = spark.createDataFrame([(i,) for i in range(2000)], "node long")
    out = components_with_isolated(
        ndf, edf, hot_threshold=100, small_graph_threshold=LOOP
    )
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
    out = connected_components(edf, max_iter=12, small_graph_threshold=LOOP)
    got = {r["node"]: r["component"] for r in out.collect()}
    assert got == {i: 0 for i in range(n)}


def test_nonconvergence_raises(spark):
    """max_iter too low must raise, never silently emit split
    components (ADVICE round 1). Loop path only — the fast path has
    no iteration to bound."""
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(23)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edf, max_iter=1, small_graph_threshold=LOOP)


def test_fast_path_equals_distributed_on_random_graph(spark):
    """The two paths must produce identical assignments on a random
    graph (200 nodes, 150 edges, fixed seed — a mix of chains, small
    components and isolated nodes)."""
    rng = random.Random(7)
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(150)
    ]
    edf = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        (r["node"], r["component"])
        for r in connected_components(
            edf, small_graph_threshold=FAST
        ).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(
            edf, small_graph_threshold=LOOP
        ).collect()
    }
    assert fast == dist
