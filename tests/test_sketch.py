"""KMV/theta sketches with set operations (operators/sketch.py) vs an
exact python replica of the estimator arithmetic."""

from __future__ import annotations

import math

import pytest

from semantic_vector_search_system_spark.functions.hashing import (
    stable_hash64_py,
)
from semantic_vector_search_system_spark.operators.sketch import (
    EXACT_THETA,
    kmv_group_sketch,
    kmv_merge,
    kmv_pair_ops,
)


def py_sketch(values, k=8):
    hs = sorted({stable_hash64_py(str(v)) for v in values})
    bottom = hs[:k]
    if len(bottom) < k:
        theta = EXACT_THETA
    else:
        theta = bottom[-1]
    return [h for h in bottom if h < theta], theta, len(bottom)


def py_pair(sa, ta, sb, tb):
    theta = min(ta, tb)
    ua = {h for h in sa if h < theta}
    ub = {h for h in sb if h < theta}
    nu, ni = len(ua | ub), len(ua & ub)
    est = lambda n: int(math.floor(float(n) * (float(EXACT_THETA) / float(theta))))  # noqa: E731
    jac = round(ni / nu, 6) if nu else 0.0
    return nu, ni, theta, est(nu), est(ni), jac


def _events(spark, rows):
    return spark.createDataFrame(rows, "event_type string, user_id long")


def test_kmv_group_sketch_exact_and_estimate_modes(spark):
    rows = [("a", i) for i in range(5)] + [("b", i) for i in range(40)]
    out = {
        r["event_type"]: r
        for r in kmv_group_sketch(
            _events(spark, rows), "event_type", "user_id", k=8
        ).collect()
    }
    for g, vals in (("a", range(5)), ("b", range(40))):
        hashes, theta, n_seen = py_sketch(vals, k=8)
        assert list(out[g]["hashes"]) == hashes, g
        assert out[g]["theta"] == theta, g
        assert out[g]["n_seen"] == n_seen, g
    assert out["a"]["theta"] == EXACT_THETA  # exact mode
    assert len(out["a"]["hashes"]) == 5
    assert len(out["b"]["hashes"]) == 7  # k-1 below theta


def test_kmv_pair_ops_matches_python_and_is_exact_when_small(spark):
    rows = (
        [("view", i) for i in range(30)]
        + [("purchase", i) for i in range(20, 60)]
    )
    # k large enough that both sides stay exact -> estimates are EXACT
    one = kmv_pair_ops(
        kmv_group_sketch(_events(spark, rows), "event_type", "user_id", k=128),
        "event_type",
        "view",
        "purchase",
    ).collect()[0]
    assert one["union_est"] == 60
    assert one["intersect_est"] == 10
    assert one["jaccard_est"] == round(10 / 60, 6)
    # estimate mode: still bit-equal to the python replica
    sa, ta, _ = py_sketch(range(30), k=8)
    sb, tb, _ = py_sketch(range(20, 60), k=8)
    want = py_pair(sa, ta, sb, tb)
    got = kmv_pair_ops(
        kmv_group_sketch(_events(spark, rows), "event_type", "user_id", k=8),
        "event_type",
        "view",
        "purchase",
    ).collect()[0]
    assert (
        got["n_union_retained"],
        got["n_intersect_retained"],
        got["theta_u"],
        got["union_est"],
        got["intersect_est"],
        got["jaccard_est"],
    ) == want


def test_kmv_estimate_accuracy_at_scale(spark):
    """k=64 KMV has ~1/sqrt(k-1) ≈ 12.6% relative std; the planted
    5000-distinct estimate must land within 3 sigma."""
    rows = [("view", i) for i in range(5000)] + [("purchase", 0)]
    est = kmv_pair_ops(
        kmv_group_sketch(_events(spark, rows), "event_type", "user_id", k=64),
        "event_type",
        "view",
        "purchase",
    ).collect()[0]["union_est"]
    assert abs(est - 5000) / 5000 < 0.38, est


def test_kmv_merge_equals_sketch_of_concatenated_data(spark):
    rows = [("d1", i) for i in range(6)] + [("d2", i) for i in range(4, 12)]
    sk = kmv_group_sketch(_events(spark, rows), "event_type", "user_id", k=32)
    merged = kmv_merge(sk, "event_type", k=32).collect()[0]
    hashes, theta, n_seen = py_sketch(range(12), k=32)
    assert list(merged["hashes"]) == hashes
    assert merged["theta"] == theta
    assert merged["n_seen"] == n_seen


def test_kmv_pair_ops_rejects_unresolved_group_labels(spark):
    """r8 ADVICE: a typo'd group label used to return ZERO rows —
    indistinguishable from a legitimate empty-set result. Now it raises
    with the offending label."""
    sk = kmv_group_sketch(
        _events(spark, [("view", 1), ("purchase", 2)]),
        "event_type", "user_id", k=8,
    )
    with pytest.raises(ValueError, match="'viwe'"):
        kmv_pair_ops(sk, "event_type", "viwe", "purchase")
    with pytest.raises(ValueError, match="'cart'"):
        kmv_pair_ops(sk, "event_type", "view", "cart")


def test_kmv_group_sketch_rejects_bad_k(spark):
    with pytest.raises(ValueError):
        kmv_group_sketch(_events(spark, [("a", 1)]), "event_type", "user_id", k=1)
