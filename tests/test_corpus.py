"""Corpus-composition operators (operators/corpus.py): per-source caps,
mixture weights, vocabulary extraction."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.corpus import (
    corpus_vocabulary,
    source_cap_sample,
    source_mixture_weights,
)


def _docs(spark):
    rows = []
    # src_a: 8 docs of growing length (longer => higher quality score here)
    for i in range(8):
        rows.append((i, "src_a", " ".join(f"w{j}" for j in range(10 + 10 * i))))
    # src_b: 2 docs only (below the cap)
    rows.append((100, "src_b", "alpha beta gamma delta"))
    rows.append((101, "src_b", "alpha beta"))
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_source_cap_keeps_top_k_per_source(spark):
    out = source_cap_sample(_docs(spark), cap=3).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    assert len(by_src["src_a"]) == 3
    # longest docs (highest quality) kept, ranked 1..3 descending by score
    kept_a = sorted(by_src["src_a"], key=lambda r: r.rank)
    assert [r.doc_id for r in kept_a] == [7, 6, 5]
    # a source below the cap keeps everything
    assert len(by_src["src_b"]) == 2


def test_source_cap_deterministic_on_score_ties(spark):
    rows = [(i, "s", "same text here always") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = sorted(r.doc_id for r in source_cap_sample(df, cap=4).collect())
    assert out == [0, 1, 2, 3]  # doc_id asc breaks the all-equal-score tie


def test_mixture_weights_budget_math(spark):
    out = {r.source: r for r in source_mixture_weights(_docs(spark), 50).collect()}
    a, b = out["src_a"], out["src_b"]
    assert a.n_docs == 8 and b.n_docs == 2
    assert a.total_tokens == sum(10 + 10 * i for i in range(8))
    assert b.total_tokens == 6
    assert b.sample_frac == 1.0  # under budget: keep everything
    assert a.sample_frac == round(min(1.0, 50 / a.total_tokens), 6)


def test_corpus_vocabulary_df_and_order(spark):
    df = spark.createDataFrame(
        [(1, "a b b"), (2, "a c"), (3, "a b")], "doc_id long, text string"
    )
    out = corpus_vocabulary(df, top_n=2).collect()
    assert [(r.token, r.df, r.total_occurrences) for r in out] == [
        ("a", 3, 3),
        ("b", 2, 3),
    ]


def test_empty_inputs_yield_typed_empty_results(spark):
    """Every round-3 operator degrades to a 0-row typed result on empty
    input — no crashes from the driver union-find, the broadcast verify,
    or the corpus aggregations."""
    from semantic_vector_search_system_spark.operators.dedup import (
        connected_components,
        neardup_clusters,
        verify_candidate_edges,
    )

    empty_pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(empty_pairs).count() == 0
    assert neardup_clusters(empty_pairs).count() == 0
    one_doc = spark.createDataFrame(
        [(1, "a", "x y z")], "doc_id long, source string, text string"
    )
    assert verify_candidate_edges(one_doc, empty_pairs, id_col="doc_id").count() == 0
    empty_docs = spark.createDataFrame([], "doc_id long, source string, text string")
    assert source_cap_sample(empty_docs).count() == 0
    assert source_mixture_weights(empty_docs).count() == 0
    assert corpus_vocabulary(empty_docs).count() == 0
