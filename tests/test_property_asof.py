"""Randomized equivalence for the as-of join's two physical strategies
(operators/asof.py): the window-carry form and the cogrouped merge_asof
form must agree with each other AND with a brute-force python oracle on
arbitrary inputs — including key skew, timestamp ties (left==right and
right==right), keys missing from either side, and empty sides.

Semantics under test: backward inclusive (a fact at exactly t is visible
to an event at t), max-tiebreak wins among equal-timestamp facts.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_vector_search_system_spark.operators.asof import (
    asof_join,
    asof_join_grouped,
)


def py_asof(left_rows, right_rows):
    """Brute force: for each left (eid, k, t) pick the right (k, rt, rid)
    with max (rt, rid) among rt <= t."""
    out = {}
    for eid, k, t in left_rows:
        cands = [(rt, rid) for (rk, rt, rid) in right_rows if rk == k and rt <= t]
        out[eid] = max(cands) if cands else (None, None)
    return out


@st.composite
def asof_case(draw):
    # tiny key/time domains force collisions, ties and empty groups
    keys = st.integers(min_value=0, max_value=3)
    times = st.integers(min_value=0, max_value=6)
    n_left = draw(st.integers(min_value=0, max_value=12))
    left = [
        (eid, draw(keys), draw(times)) for eid in range(n_left)
    ]
    n_right = draw(st.integers(min_value=0, max_value=12))
    right = [
        (draw(keys), draw(times), rid) for rid in range(n_right)
    ]
    return left, right


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(case=asof_case())
def test_asof_strategies_match_each_other_and_python_oracle(spark, case):
    left_rows, right_rows = case
    left = spark.createDataFrame(
        left_rows or [(None, None, None)], "event_id int, k int, t int"
    )
    if not left_rows:
        left = left.filter("event_id IS NOT NULL")
    right = spark.createDataFrame(
        right_rows or [(None, None, None)], "k int, rt int, rid int"
    )
    if not right_rows:
        right = right.filter("rid IS NOT NULL")

    kw = dict(
        on="k", left_time="t", right_time="rt",
        payload_cols=["rt", "rid"], right_tiebreak="rid",
    )
    expected = py_asof(left_rows, right_rows)

    window_form = {
        r["event_id"]: (r["rt"], r["rid"])
        for r in asof_join(left, right, **kw).collect()
    }
    grouped_form = {
        r["event_id"]: (r["rt"], r["rid"])
        for r in asof_join_grouped(left, right, **kw).collect()
    }
    assert window_form == expected
    assert grouped_form == expected


def test_asof_null_keys_form_one_ordinary_group(spark):
    """Null join keys behave as ONE ordinary group in BOTH strategies
    (Window.partitionBy groups nulls together; the bucketed merge_asof
    form must not raise pandas MergeError nor silently drop matches).
    ADVICE r3: the null-key edge of asof_join_grouped."""
    left = spark.createDataFrame(
        [(0, None, 5), (1, None, 1), (2, 7, 5), (3, 8, 5)],
        "event_id int, k int, t int",
    )
    right = spark.createDataFrame(
        [(None, 2, 10), (None, 4, 11), (7, 3, 12), (9, 0, 13)],
        "k int, rt int, rid int",
    )
    kw = dict(
        on="k", left_time="t", right_time="rt",
        payload_cols=["rt", "rid"], right_tiebreak="rid",
    )
    # null-key left rows match only null-key right facts; key 8 has no
    # facts at all; key 7 matches its own group
    expected = {0: (4, 11), 1: (None, None), 2: (3, 12), 3: (None, None)}
    for form in (asof_join, asof_join_grouped):
        got = {
            r["event_id"]: (r["rt"], r["rid"]) for r in form(left, right, **kw).collect()
        }
        assert got == expected, form.__name__
