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
