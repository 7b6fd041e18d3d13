"""Property-based agreement between the Spark metrics aggregations and a
pure-Python re-implementation of the reference's metric semantics
(`evaluation/metrics.py` behavior: precision divides by len(topk), recall 0
on empty qrels, AP mean-over-hit-ranks, 0 when no hits)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_vector_search_system_spark.operators.metrics import per_query_metrics


def py_metrics(retrieved: list[str], relevant: set[str], k: int):
    topk = retrieved[:k]
    p = (len([d for d in topk if d in relevant]) / len(topk)) if topk else 0.0
    r = (len([d for d in topk if d in relevant]) / len(relevant)) if relevant else 0.0
    hits, ap_terms = 0, []
    for rank, d in enumerate(retrieved, start=1):
        if d in relevant:
            hits += 1
            ap_terms.append(hits / rank)
    ap = sum(ap_terms) / len(ap_terms) if ap_terms else 0.0
    rr = 0.0
    for rank, d in enumerate(retrieved, start=1):
        if d in relevant:
            rr = 1.0 / rank
            break
    return p, r, ap, rr


@st.composite
def retrieval_case(draw):
    n_docs = draw(st.integers(min_value=1, max_value=12))
    docs = [f"d{i}" for i in range(n_docs)]
    retrieved = draw(
        st.lists(st.sampled_from(docs), min_size=1, max_size=n_docs, unique=True)
    )
    relevant = draw(st.sets(st.sampled_from(docs), max_size=n_docs))
    k = draw(st.integers(min_value=1, max_value=12))
    return retrieved, relevant, k


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=retrieval_case())
def test_spark_metrics_match_python_reference(spark, case):
    retrieved, relevant, k = case
    ret = spark.createDataFrame(
        [("q1", d, i + 1) for i, d in enumerate(retrieved)],
        "qid string, docid string, rank int",
    )
    qrels = spark.createDataFrame(
        [("q1", d) for d in sorted(relevant)] or [("qX", "dX")],
        "qid string, docid string",
    )
    row = per_query_metrics(ret, qrels, k_values=(k,)).collect()[0]
    p, r, ap, rr = py_metrics(retrieved, relevant, k)
    assert row[f"p_at_{k}"] == pytest.approx(p)
    assert row[f"r_at_{k}"] == pytest.approx(r)
    assert row["ap"] == pytest.approx(ap)
    assert row["rr"] == pytest.approx(rr)


@st.composite
def vector_corpus(draw):
    dim = draw(st.integers(min_value=2, max_value=6))
    n_docs = draw(st.integers(min_value=2, max_value=10))
    n_q = draw(st.integers(min_value=1, max_value=3))
    elems = st.floats(min_value=-5, max_value=5, allow_nan=False, width=32)
    docs = [
        (i, draw(st.lists(elems, min_size=dim, max_size=dim))) for i in range(n_docs)
    ]
    qs = [
        (100 + i, draw(st.lists(elems, min_size=dim, max_size=dim)))
        for i in range(n_q)
    ]
    k = draw(st.integers(min_value=1, max_value=n_docs))
    return docs, qs, k


@pytest.mark.usefixtures("spark")
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=vector_corpus())
def test_topk_matches_numpy_oracle_random_vectors(spark, case):
    import numpy as np

    from semantic_vector_search_system_spark.operators.search import topk_bruteforce

    docs, qs, k = case
    d = spark.createDataFrame(docs, "docid long, vec array<float>")
    q = spark.createDataFrame(qs, "qid long, qvec array<float>")
    got = {}
    for r in topk_bruteforce(q, d, k=k, metric="dot").collect():
        got.setdefault(r["qid"], []).append((r["rank"], r["docid"]))
    D = np.array([np.array(v, dtype=np.float32) for _, v in docs], dtype=np.float64)
    ids = [i for i, _ in docs]
    for qid, qv in qs:
        scores = D @ np.array(np.array(qv, dtype=np.float32), dtype=np.float64)
        order = sorted(range(len(ids)), key=lambda i: (-scores[i], ids[i]))[:k]
        want = [(rk + 1, ids[i]) for rk, i in enumerate(order)]
        assert sorted(got[qid]) == want, (qid, scores)


@st.composite
def event_stream(draw):
    n_users = draw(st.integers(min_value=1, max_value=3))
    events = []
    eid = 0
    for u in range(n_users):
        n_ev = draw(st.integers(min_value=1, max_value=12))
        t = 0
        for _ in range(n_ev):
            t += draw(st.integers(min_value=1, max_value=4000))  # seconds gap
            events.append((u, eid, t * 1_000_000))
            eid += 1
    return events


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(events=event_stream())
def test_sessionization_matches_python_oracle(spark, events):
    """Random event streams: the catalog sessionization logic (lag + cumsum
    on 30-min gaps) must equal a direct python scan."""
    from pyspark.sql import Window
    import pyspark.sql.functions as F

    df = spark.createDataFrame(events, "user_id long, event_id long, ts_us long")
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    flagged = df.withColumn(
        "new_sess",
        F.when(F.col("ts_us") - F.lag("ts_us").over(w) > 1_800_000_000, 1).otherwise(0),
    )
    got = {
        (r["user_id"], r["sess_idx"]): (r["n"], r["start"], r["end"])
        for r in flagged.withColumn("sess_idx", F.sum("new_sess").over(wrun))
        .groupBy("user_id", "sess_idx")
        .agg(F.count("*").alias("n"), F.min("ts_us").alias("start"), F.max("ts_us").alias("end"))
        .collect()
    }
    # python oracle
    want = {}
    by_user: dict = {}
    for u, e, t in sorted(events, key=lambda x: (x[0], x[2], x[1])):
        by_user.setdefault(u, []).append(t)
    for u, ts in by_user.items():
        idx, start, prev, n = 0, ts[0], ts[0], 0
        for t in ts:
            if t - prev > 1_800_000_000:
                want[(u, idx)] = (n, start, prev)
                idx, start, n = idx + 1, t, 0
            n += 1
            prev = t
        want[(u, idx)] = (n, start, prev)
    assert got == want


@st.composite
def doc_pairs(draw):
    vocab = ["a", "b", "c", "d", "e"]
    docs = []
    for i in range(draw(st.integers(min_value=2, max_value=5))):
        toks = draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=12))
        docs.append((i, " ".join(toks)))
    return docs


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(docs=doc_pairs())
def test_jaccard_matches_python_oracle(spark, docs):
    from semantic_vector_search_system_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, shingle_n=2, threshold=0.0).collect()
    }

    def shingles(text):
        toks = text.split()
        n = max(len(toks) - 1, 1)
        return {" ".join(toks[i : i + 2]) for i in range(n)}

    for i, (ida, ta) in enumerate(docs):
        for idb, tb in docs[i + 1 :]:
            sa, sb = shingles(ta), shingles(tb)
            inter = len(sa & sb)
            if inter == 0:
                assert (ida, idb) not in got
            else:
                expect = round(inter / len(sa | sb), 4)
                assert got[(ida, idb)] == pytest.approx(expect, abs=1e-4)


@st.composite
def asof_case(draw):
    n_keys = draw(st.integers(min_value=1, max_value=2))
    lefts, rights = [], []
    lid = 0
    for k in range(n_keys):
        for _ in range(draw(st.integers(min_value=0, max_value=6))):
            lefts.append((k, draw(st.integers(min_value=0, max_value=20)), lid))
            lid += 1
        for j in range(draw(st.integers(min_value=0, max_value=6))):
            rights.append((k, draw(st.integers(min_value=0, max_value=20)), 1000 + lid + j))
        lid += 10
    return lefts, rights


@pytest.mark.usefixtures("spark")
@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=asof_case())
def test_asof_strategies_agree_random(spark, case):
    """Window-form and merge_asof-form as-of joins agree on random streams,
    including exact-tie timestamps (small int times force collisions)."""
    from semantic_vector_search_system_spark.operators.asof import (
        asof_join,
        asof_join_grouped,
    )

    lefts, rights = case
    if not lefts:
        return
    left = spark.createDataFrame(lefts, "k long, t long, eid long")
    right = spark.createDataFrame(
        rights or [(999, 0, 0)], "k long, t long, fact long"
    )
    kw = dict(on="k", left_time="t", right_time="t",
              payload_cols=["fact"], right_tiebreak="fact")
    a = sorted((r["eid"], r["fact"]) for r in asof_join(left, right, **kw).collect())
    b = sorted((r["eid"], r["fact"]) for r in asof_join_grouped(left, right, **kw).collect())
    assert a == b
