"""PageRank over pair graphs (operators/graph.py) vs a python replica
of the exact rounded-iteration arithmetic."""

from __future__ import annotations

from decimal import Decimal

import pytest

from semantic_vector_search_system_spark.operators.graph import pagerank


def py_pagerank(edges, damping=0.85, n_iter=3):
    und = edges + [(b, a) for a, b in edges]
    deg: dict[int, int] = {}
    for s, _ in und:
        deg[s] = deg.get(s, 0) + 1
    n = float(len(deg))
    pr = {v: round(1.0 / n, 12) for v in deg}
    teleport = (1.0 - damping) / n
    for _ in range(n_iter):
        msgs: dict[int, list[float]] = {}
        for s, d in und:
            msgs.setdefault(d, []).append(round(pr[s] / deg[s], 12))
        pr = {
            v: round(
                teleport
                + damping
                * float(sum(Decimal(f"{m:.12f}") for m in ms)),
                12,
            )
            for v, ms in msgs.items()
        }
    return {v: (deg[v], pr[v]) for v in pr}


EDGES = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (2, 4), (6, 7)]


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_pagerank_matches_python_replica(spark):
    got = {
        r["node"]: (r["degree"], r["pagerank"])
        for r in pagerank(_pairs(spark, EDGES), n_iter=3).collect()
    }
    assert got == py_pagerank(EDGES, n_iter=3)


def test_pagerank_mass_and_hub_ordering(spark):
    out = {r["node"]: r["pagerank"] for r in pagerank(_pairs(spark, EDGES)).collect()}
    assert abs(sum(out.values()) - 1.0) < 1e-9
    # nodes 3 and 4 (degree 3) outrank the degree-1 leaf 5
    assert out[3] > out[5] and out[4] > out[5]


def test_pagerank_partitioning_invariant(spark):
    a = sorted(map(tuple, pagerank(_pairs(spark, EDGES).repartition(13), n_iter=4).collect()))
    b = sorted(map(tuple, pagerank(_pairs(spark, EDGES).coalesce(1), n_iter=4).collect()))
    assert a == b


def test_pagerank_zero_iterations_is_uniform(spark):
    out = {r["node"]: r["pagerank"] for r in pagerank(_pairs(spark, EDGES), n_iter=0).collect()}
    assert set(out.values()) == {round(1.0 / 7, 12)}


def test_pagerank_empty_graph(spark):
    empty = _pairs(spark, []).limit(0)
    out = pagerank(empty)
    assert out.columns == ["node", "degree", "pagerank"]
    assert out.count() == 0
    with pytest.raises(ValueError):
        pagerank(empty, n_iter=-1)
