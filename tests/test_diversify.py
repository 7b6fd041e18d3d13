"""MMR diversification (operators/diversify.py): greedy behavior on
planted near-duplicate pools, tie handling, short-pool contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.diversify import mmr_rerank


def _rel(spark, qvec, docs):
    q = spark.createDataFrame([(0, qvec)], "qid long, qvec array<double>")
    d = spark.createDataFrame(
        [(i, v) for i, v in enumerate(docs)], "docid long, v array<double>"
    )
    return q, d


def test_mmr_skips_near_duplicate_of_first_pick(spark):
    """Pool: doc0 = argmax rel, doc1 = its exact copy (same rel), doc2 =
    anti-correlated with doc0 but still query-relevant. Plain top-2
    returns (0, 1); MMR's second pick must be the diverse doc2:
    marginal(doc1) = 0.5*0.9 - 0.5*0.999 < 0 (self-similarity ~1
    dominates) while marginal(doc2) = 0.5*0.6 - 0.5*0.2355 > 0."""
    q, d = _rel(
        spark,
        [1.0, 0.0, 0.0],
        [
            [0.9, 0.435, 0.0],   # 0: best rel (0.9)
            [0.9, 0.435, 0.0],   # 1: exact duplicate of 0 (sim ~0.999)
            [0.6, -0.7, 0.0],    # 2: rel 0.6, sim to doc0 = 0.2355
        ],
    )
    got = {r["step"]: r["docid"] for r in mmr_rerank(q, d, k=2, pool_size=3).collect()}
    assert got[1] == 0 and got[2] == 2


def test_mmr_step1_is_argmax_rel_with_id_ties(spark):
    q, d = _rel(spark, [1.0, 0.0], [[0.5, 0.5], [0.5, 0.5], [0.2, 0.0]])
    rows = mmr_rerank(q, d, k=3, pool_size=3).collect()
    by_step = {r["step"]: r["docid"] for r in rows}
    assert by_step[1] == 0  # equal rel -> smaller docid first


def test_mmr_short_pool_emits_fewer_rows(spark):
    q, d = _rel(spark, [1.0], [[0.4], [0.2]])
    rows = mmr_rerank(q, d, k=5, pool_size=10).collect()
    assert len(rows) == 2
    assert sorted(r["step"] for r in rows) == [1, 2]


def test_mmr_per_query_independence(spark):
    q = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "qid long, qvec array<double>"
    )
    d = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.5, 0.5])],
        "docid long, v array<double>",
    )
    rows = mmr_rerank(q, d, k=1, pool_size=3).collect()
    first = {r["qid"]: r["docid"] for r in rows if r["step"] == 1}
    assert first == {0: 0, 1: 1}


def test_mmr_empty_docs_raises_clear_error(spark):
    """r8 ADVICE: an empty docs relation used to die with a bare
    TypeError from first()[0]; the contract error names the problem."""
    import pytest

    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    empty = spark.createDataFrame([], "docid long, v array<double>")
    with pytest.raises(ValueError, match="empty"):
        mmr_rerank(q, empty, k=2)
    nullvec = spark.createDataFrame([(1, None)], "docid long, v array<double>")
    with pytest.raises(ValueError, match="NULL"):
        mmr_rerank(q, nullvec, k=2)
