"""Normalize-then-hash dedup (operators/dedup.py::normalized_exact_dedup)
and leakage-safe splits (operators/corpus.py::leakage_safe_splits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.functions.hashing import stable_hash64_py
from semantic_vector_search_system_spark.operators.corpus import leakage_safe_splits
from semantic_vector_search_system_spark.operators.dedup import (
    exact_dedup,
    normalized_exact_dedup,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_normalized_dedup_collapses_case_and_punct_variants(spark):
    docs = _docs(
        spark,
        [
            "Hello, World!",          # 0: three raw variants, one norm group
            "hello world",            # 1
            "HELLO   world.",         # 2
            "something else",         # 3: singleton
            "something else",         # 4: raw exact dup of 3
        ],
    )
    rows = {r["canonical_id"]: r for r in normalized_exact_dedup(docs).collect()}
    assert rows[0]["n_copies"] == 3 and rows[0]["n_raw_variants"] == 3
    assert rows[3]["n_copies"] == 2 and rows[3]["n_raw_variants"] == 1
    # raw exact dedup would NOT merge the case variants
    raw = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert raw[0] == 1 and raw[1] == 1 and raw[2] == 1 and raw[3] == 2


def test_normalized_dedup_reduces_to_exact_on_normalized_corpus(spark):
    docs = _docs(spark, ["alpha beta", "alpha beta", "gamma", ""])
    a = sorted(
        (r["n_copies"], r["canonical_id"], r["n_raw_variants"])
        for r in normalized_exact_dedup(docs).collect()
    )
    b = sorted(
        (r["n_copies"], r["canonical_id"], 1) for r in exact_dedup(docs).collect()
    )
    assert a == b


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_leakage_safe_splits_keep_components_together(spark):
    docs = _docs(spark, [f"doc {i}" for i in range(10)])
    # chain 0~1~2 and pair 5~7: each component must share one split
    pairs = _pairs(spark, [(0, 1), (1, 2), (5, 7)])
    out = {r["doc_id"]: r for r in
           leakage_safe_splits(docs, pairs, {"train": 8, "val": 1, "test": 1},
                               seed=7).collect()}
    assert len(out) == 10
    assert {out[i]["group_key"] for i in (0, 1, 2)} == {0}
    assert {out[i]["group_key"] for i in (5, 7)} == {5}
    assert len({out[i]["split"] for i in (0, 1, 2)}) == 1
    assert out[5]["split"] == out[7]["split"]
    # singletons: own id is the group key, split = hash('7:id') % 10 rule
    for i in (3, 4, 6, 8, 9):
        assert out[i]["group_key"] == i
        b = stable_hash64_py(f"7:{i}") % 10
        want = "train" if b < 8 else ("val" if b < 9 else "test")
        assert out[i]["split"] == want


def test_leakage_safe_splits_incremental_stability(spark):
    """New members joining an existing cluster inherit its split: the
    split key is the component MIN id, which adding larger ids never
    changes."""
    docs1 = _docs(spark, [f"d{i}" for i in range(4)])
    out1 = {r["doc_id"]: r["split"] for r in
            leakage_safe_splits(docs1, _pairs(spark, [(0, 2)]),
                                {"train": 8, "val": 1, "test": 1}).collect()}
    docs2 = _docs(spark, [f"d{i}" for i in range(6)])
    out2 = {r["doc_id"]: r["split"] for r in
            leakage_safe_splits(docs2, _pairs(spark, [(0, 2), (2, 5)]),
                                {"train": 8, "val": 1, "test": 1}).collect()}
    for i in range(4):
        assert out2[i] == out1[i]
    assert out2[5] == out2[0]  # joined 0's cluster -> inherited its split


def test_normalize_text_edge_cases(spark):
    """normalize_text: idempotent, case/punct-insensitive, whitespace-
    collapsing; non-ASCII letters fall to the punctuation class (ASCII
    C4 shape, documented)."""
    from semantic_vector_search_system_spark.functions.text import normalize_text

    rows = [
        (0, "  Hello,   WORLD!!  "),
        (1, "hello world"),
        (2, "h\te\nl lo?"),
        (3, "Crème brûlée 42"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["n"] for r in df.select("i", normalize_text("t").alias("n")).collect()}
    assert got[0] == "hello world" == got[1]
    assert got[2] == "h e l lo"
    assert got[3] == "cr me br l e 42"   # accented letters -> space
    assert got[4] == ""
    assert got[5] is None
    # idempotence: normalizing the normalized strings is a fixpoint
    df2 = spark.createDataFrame([(k, v) for k, v in got.items() if v is not None],
                                "i long, t string")
    again = {r["i"]: r["n"] for r in df2.select("i", normalize_text("t").alias("n")).collect()}
    assert again == {k: v for k, v in got.items() if v is not None}
