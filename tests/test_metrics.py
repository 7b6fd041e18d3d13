"""Golden tests for IR metrics against hand-computed values, preserving the
reference's edge-case semantics (`evaluation/metrics.py:7-8,16-17,52-53`)."""

from __future__ import annotations

import pytest

from semantic_vector_search_system_spark.operators.metrics import (
    evaluate_all,
    per_query_metrics,
)


def _ret(spark, rows):
    return spark.createDataFrame(rows, "qid string, docid string, rank int")


def _qrels(spark, rows):
    return spark.createDataFrame(rows, "qid string, docid string")


def test_precision_recall_known_values(spark):
    # q1: retrieved [d1, d2, d3], relevant {d1, d3}
    ret = _ret(spark, [("q1", "d1", 1), ("q1", "d2", 2), ("q1", "d3", 3)])
    qrels = _qrels(spark, [("q1", "d1"), ("q1", "d3")])
    row = per_query_metrics(ret, qrels, k_values=(1, 2, 3)).collect()[0]
    assert row["p_at_1"] == 1.0
    assert row["p_at_2"] == 0.5
    assert row["p_at_3"] == pytest.approx(2 / 3)
    assert row["r_at_1"] == 0.5
    assert row["r_at_3"] == 1.0
    # AP: hits at ranks 1 and 3 -> mean(1/1, 2/3) = 5/6
    assert row["ap"] == pytest.approx(5 / 6)
    assert row["rr"] == 1.0


def test_precision_divides_by_retrieved_not_k(spark):
    # Reference metrics.py:9-12: fewer than k retrieved -> divide by len(topk).
    ret = _ret(spark, [("q1", "d1", 1), ("q1", "d2", 2)])
    qrels = _qrels(spark, [("q1", "d1")])
    row = per_query_metrics(ret, qrels, k_values=(5,)).collect()[0]
    assert row["p_at_5"] == 0.5  # 1 hit / 2 retrieved, not 1/5


def test_empty_qrels_gives_zero_recall_and_ap(spark):
    # Reference metrics.py:16-17,52-53.
    ret = _ret(spark, [("q1", "d1", 1)])
    qrels = _qrels(spark, [("q2", "dX")])  # nothing for q1
    row = per_query_metrics(ret, qrels, k_values=(1,)).collect()[0]
    assert row["r_at_1"] == 0.0
    assert row["ap"] == 0.0
    assert row["rr"] == 0.0


def test_no_hits_ap_zero(spark):
    ret = _ret(spark, [("q1", "d9", 1), ("q1", "d8", 2)])
    qrels = _qrels(spark, [("q1", "d1")])
    row = per_query_metrics(ret, qrels, k_values=(2,)).collect()[0]
    assert row["ap"] == 0.0
    assert row["p_at_2"] == 0.0
    assert row["rr"] == 0.0


def test_evaluate_all_means_over_queries(spark):
    ret = _ret(
        spark,
        [("q1", "d1", 1), ("q1", "d2", 2), ("q2", "dX", 1), ("q2", "d5", 2)],
    )
    qrels = _qrels(spark, [("q1", "d1"), ("q2", "d5")])
    row = evaluate_all(ret, qrels, k_values=(2,)).collect()[0]
    assert row["p_at_2"] == pytest.approx(0.5)  # (1/2 + 1/2) / 2
    assert row["r_at_2"] == pytest.approx(1.0)
    # APs: q1 -> 1.0 (hit@1), q2 -> 0.5 (hit@2) -> MAP 0.75
    assert row["map"] == pytest.approx(0.75)
    assert row["mrr"] == pytest.approx(0.75)
    assert row["n_queries"] == 2


def test_ndcg_matches_python_reference(spark):
    """per_query_ndcg vs a direct python replay (binary relevance,
    literal discount table, decimal DCG, round-6), including the
    no-relevant and no-hit edge cases."""
    import math
    from decimal import Decimal

    from semantic_vector_search_system_spark.operators.metrics import (
        per_query_ndcg,
    )

    retr = spark.createDataFrame(
        # q0: hits at ranks 1 and 3 of 3; q1: no hits; q2: perfect top-2
        [(0, 10, 1), (0, 11, 2), (0, 12, 3),
         (1, 20, 1), (1, 21, 2),
         (2, 30, 1), (2, 31, 2)],
        "qid long, docid long, rank int",
    )
    qrels = spark.createDataFrame(
        [(0, 10), (0, 12), (0, 99),     # n_rel=3, hits at 1 and 3
         (2, 30), (2, 31)],             # n_rel=2, perfect
        "qid long, docid long",
    )
    got = {r["qid"]: (r["n_rel"], r["ndcg_at_10"])
           for r in per_query_ndcg(retr, qrels, k=10).collect()}

    disc = [round(1.0 / math.log2(r + 1), 12) for r in range(1, 11)]
    def py_ndcg(hit_ranks, n_rel):
        dcg = sum((Decimal(repr(disc[r - 1])) for r in hit_ranks), Decimal(0))
        idcg = sum((Decimal(repr(d)) for d in disc[: min(n_rel, 10)]), Decimal(0))
        return round(float(dcg) / float(idcg), 6)

    assert got[0] == (3, py_ndcg([1, 3], 3))
    assert got[1] == (0, 0.0)       # no qrels -> n_rel 0, ndcg 0
    assert got[2] == (2, py_ndcg([1, 2], 2))
    assert got[2][1] == 1.0          # perfect ranking normalizes to 1
