"""Randomized equivalence for connected_components' two physical
strategies (operators/dedup.py): the driver union-find (small graphs) and
the distributed min-label propagation must agree with each other AND with
a brute-force python oracle on arbitrary pair graphs — including self
loops, duplicate edges in both orientations, chains, and dense blobs.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_vector_search_system_spark.operators.dedup import connected_components


def py_components(edges):
    """Brute-force label propagation to fixpoint: component = min node id."""
    nodes = {n for e in edges for n in e}
    label = {n: n for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            m = min(label[a], label[b])
            for n in (a, b):
                if label[n] > m:
                    label[n] = m
                    changed = True
        # propagate through labels (labels are node ids)
        for n in nodes:
            if label[label[n]] < label[n]:
                label[n] = label[label[n]]
                changed = True
    return set(label.items())


edge = st.tuples(
    st.integers(min_value=0, max_value=14), st.integers(min_value=0, max_value=14)
)


@given(edges=st.lists(edge, min_size=1, max_size=40))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_components_strategies_match_python_oracle(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    want = py_components(edges)
    fast = {
        (r.node, r.component) for r in connected_components(pairs).collect()
    }
    assert fast == want
    slow = {
        (r.node, r.component)
        for r in connected_components(pairs, small_edge_threshold=0).collect()
    }
    assert slow == want
