"""Adaptive recrawl scheduling (operators/recrawl.py, r11)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.recrawl import (
    diff_to_history,
    recrawl_priority,
)


def _py_priority(events, now):
    """Pure-python reference: events = [(snapshot_id, status), ...]."""
    n_checks = len(events)
    n_changes = sum(1 for _, st in events if st in ("added", "changed"))
    last_seen = max(s for s, _ in events)
    changes = [s for s, st in events if st in ("added", "changed")]
    last_change = max(changes) if changes else None
    latest = max(events)[1]
    if latest == "removed":
        return None
    age = float(now - last_seen + 1)
    rate = math.floor((n_changes + 1) / (n_checks + 2) * 1e12 + 0.5) / 1e12
    return (
        n_checks, n_changes, last_change, rate,
        math.floor(rate * age * 1e12 + 0.5) / 1e12,
    )


HIST = [
    # hot page: changed in both diffs -> max rate, age 1
    ("u/hot", 2, "changed"), ("u/hot", 3, "changed"),
    # cold page: never changed -> Laplace floor, ages from first obs
    ("u/cold", 2, "unchanged"), ("u/cold", 3, "unchanged"),
    # stale change: changed once, then quiet -> age grows
    ("u/stale", 2, "changed"), ("u/stale", 3, "unchanged"),
    # removed latest -> leaves the frontier entirely
    ("u/gone", 2, "changed"), ("u/gone", 3, "removed"),
    # re-discovery: removed then re-added -> back in, added counts as change
    ("u/back", 2, "removed"), ("u/back", 3, "added"),
    # single observation (first diff it appears in)
    ("u/new", 3, "added"),
    # partial-recrawl skip: churning page NOT visited in the newest
    # snapshot — staleness must accumulate (age 2)
    ("u/unseen", 2, "changed"),
]


def test_recrawl_priority_matches_python_reference(spark):
    df = spark.createDataFrame(
        HIST, "canonical_url string, snapshot_id int, status string"
    )
    for parts in (1, 7):
        rows = {
            r["canonical_url"]: (
                r["n_checks"], r["n_changes"], r["last_change_snapshot"],
                r["change_rate"], r["priority"],
            )
            for r in recrawl_priority(df.repartition(parts)).collect()
        }
        want = {}
        now = max(s for _, s, _ in HIST)
        for url in {h[0] for h in HIST}:
            ev = [(s, st) for u, s, st in HIST if u == url]
            ref = _py_priority(ev, now)
            if ref is not None:
                want[url] = ref
        assert rows == want
    assert "u/gone" not in rows            # removed leaves the frontier
    assert rows["u/back"][1] == 1          # re-added counts as a change
    assert rows["u/hot"][4] > rows["u/cold"][4]   # churn outranks static
    assert rows["u/hot"][4] > rows["u/stale"][4]  # hot churn outranks old
    # a churning page SKIPPED by the last crawl accumulates staleness and
    # tops even the hot page (expected missed changes: 2/3 * 2 > 3/4 * 1)
    assert rows["u/unseen"][4] > rows["u/hot"][4]


def test_recrawl_frontier_topk_plan_and_order(spark):
    df = spark.createDataFrame(
        HIST, "canonical_url string, snapshot_id int, status string"
    )
    top = recrawl_priority(df, frontier_size=3)
    plan = top._jdf.queryExecution().executedPlan().toString()
    # global top-k must be TakeOrderedAndProject (per-partition bounded
    # heaps), and the only shuffle is the URL-keyed aggregation
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 1, plan[:2000]
    got = [r["canonical_url"] for r in top.collect()]
    allr = sorted(
        recrawl_priority(df).collect(),
        key=lambda r: (-r["priority"], r["canonical_url"]),
    )
    assert got == [r["canonical_url"] for r in allr[:3]]


def test_diff_to_history_roundtrip(spark):
    from semantic_vector_search_system_spark.operators.dedup import (
        snapshot_diff,
    )

    old = spark.createDataFrame(
        [("a", "one two three"), ("b", "same text here")],
        "url string, text string",
    )
    new = spark.createDataFrame(
        [("a", "one two three CHANGED"), ("c", "fresh page body")],
        "url string, text string",
    )
    d = snapshot_diff(old, new, key_col="url", text_col="text")
    h = diff_to_history(d, 7, url_col="url")
    rows = {r["canonical_url"]: (r["snapshot_id"], r["status"])
            for r in h.collect()}
    assert rows == {
        "a": (7, "changed"), "b": (7, "removed"), "c": (7, "added"),
    }
