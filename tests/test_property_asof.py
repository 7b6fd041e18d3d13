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


def test_asof_grouped_1m_bucket_invariance_with_nulls(spark):
    """VERDICT r4 item 7: the bucketed merge_asof strategy at the bench's
    1M-row scale — with null keys on both sides, exact left==right
    timestamp ties, and keys with no facts — must produce IDENTICAL
    results for different bucket counts (bucket boundaries move, matches
    must not) and agree with the window-carry strategy.

    Full-result equality is checked distributively via an order-insensitive
    checksum (sum of a row hash) + count + payload aggregates — no 1M-row
    collect."""
    from pyspark.sql import functions as F

    n_left, n_right, n_keys = 1_000_000, 100_000, 50_000
    # key: null every 97th row; time: pseudo-random in a domain narrow
    # enough to force left==right ties; everything deterministic from id
    left = spark.range(n_left).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 97 == 0, F.lit(None))
        .otherwise(F.pmod(F.col("id") * 2654435761, F.lit(n_keys)))
        .cast("long")
        .alias("k"),
        F.pmod(F.col("id") * 40503, F.lit(10_000)).cast("long").alias("t"),
    )
    right = spark.range(n_right).select(
        F.when(F.col("id") % 89 == 0, F.lit(None))
        # ~half the key domain has facts -> many left rows have no match
        .otherwise(F.pmod(F.col("id") * 69069, F.lit(n_keys // 2)))
        .cast("long")
        .alias("k"),
        F.pmod(F.col("id") * 48271, F.lit(10_000)).cast("long").alias("rt"),
        F.col("id").alias("rid"),
    )
    kw = dict(
        on="k", left_time="t", right_time="rt",
        payload_cols=["rt", "rid"], right_tiebreak="rid",
    )

    def checksum(df):
        row = df.agg(
            F.count("*").alias("n"),
            # decimal(38) sum: 1M signed-64 hashes overflow a long under ANSI
            F.sum(F.xxhash64("event_id", "rt", "rid").cast("decimal(38,0)")).alias("h"),
            F.sum("rt").alias("s_rt"),
            F.sum("rid").alias("s_rid"),
            F.count("rid").alias("n_matched"),
        ).collect()[0]
        return tuple(row)

    want = checksum(asof_join(left, right, **kw))
    assert want[0] == n_left
    assert 0 < want[4] < n_left  # some matched, some not — the case is real
    # bucket-count sweep: 7 (prime, uneven), 32 (bench default), 256 (many
    # near-empty buckets) — bucket boundaries shift, results must not
    for nb in (7, 32, 256):
        got = checksum(asof_join_grouped(left, right, num_buckets=nb, **kw))
        assert got == want, f"num_buckets={nb}: {got} != {want}"
