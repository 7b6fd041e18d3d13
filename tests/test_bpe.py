"""Distributed BPE training (operators/bpe.py) vs the classic
reference algorithm (Sennrich et al. 2016) implemented transparently in
python: identical merge lists on arbitrary corpora (tiny alphabets force
ties, overlapping pairs and early exhaustion), and encoding consistency.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_vector_search_system_spark.operators.bpe import (
    bpe_encode,
    bpe_token_counts,
    bpe_train,
    word_frequency_table,
)


def py_bpe_train(texts, n_merges, min_pair_count=2):
    """Classic reference: word-frequency dict, per-iteration weighted
    pair counts, argmax by (count desc, pair asc), greedy left-to-right
    rewrite."""
    wf = {}
    for t in texts:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    vocab = {tuple(w): c for w, c in wf.items()}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] = counts.get(
                    (sym[i], sym[i + 1]), 0
                ) + c
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p[0], p[1]))
        if counts[best] < min_pair_count:
            break
        merges.append(best)
        a, b = best
        new_vocab = {}
        for sym, c in vocab.items():
            out = []
            for s in sym:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def py_bpe_encode(text, merges):
    out = []
    for w in text.split():
        sym = list(w)
        for a, b in merges:
            nxt = []
            for s in sym:
                if nxt and nxt[-1] == a and s == b:
                    nxt[-1] = a + b
                else:
                    nxt.append(s)
            sym = nxt
        out.extend(sym)
    return out


def test_bpe_train_fixture(spark):
    texts = ["low lower lowest", "low low newer newest", "wider new newer"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = bpe_train(df, n_merges=8)
    want = py_bpe_train(texts, 8)
    assert got == want
    # the most frequent pair on this corpus merges first
    assert got[0] == want[0]
    enc = {
        r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
        for r in bpe_encode(
            spark.createDataFrame(
                list(enumerate(texts)), "doc_id long, text string"
            ),
            got,
        ).collect()
    }
    for i, t in enumerate(texts):
        ptoks = py_bpe_encode(t, want)
        assert enc[i] == (ptoks, len(ptoks)), i


def test_bpe_early_stop_when_pairs_exhaust(spark):
    df = spark.createDataFrame([("a bb a",)], "text string")
    # "bb" is the only multi-symbol word (count 1 < min_pair_count=2)
    assert bpe_train(df, n_merges=5) == []
    assert bpe_train(df, n_merges=5, min_pair_count=1) == [("b", "b")]


TOKENS = ["ab", "aab", "bba", "abab", "a", "b"]


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(st.sampled_from(TOKENS), min_size=1, max_size=12),
    n_merges=st.integers(min_value=1, max_value=5),
)
def test_bpe_train_matches_python_reference(spark, words, n_merges):
    texts = [" ".join(words)]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert bpe_train(df, n_merges=n_merges) == py_bpe_train(texts, n_merges)


def test_word_frequency_table(spark):
    df = spark.createDataFrame([("x y x",), ("y",)], "text string")
    got = {r["word"]: r["count"] for r in word_frequency_table(df).collect()}
    assert got == {"x": 2, "y": 2}


def test_bpe_token_counts_strategies_match_encode_explode(spark):
    """Both bpe_token_counts strategies (vocab-compressed arrow / expr)
    equal the histogram of exploding bpe_encode over the raw corpus, and
    the python reference."""
    texts = ["low lower lowest", "low low newer newest", "wider new newer", "aaa aa a"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rules = bpe_train(df, n_merges=5, min_pair_count=1)

    want: dict[str, int] = {}
    for t in texts:
        for tok in py_bpe_encode(t, rules):
            want[tok] = want.get(tok, 0) + 1

    from pyspark.sql import functions as F

    exploded = {
        r["token"]: r["n"]
        for r in bpe_encode(df, rules)
        .select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert exploded == want
    for strategy in ("arrow", "expr"):
        got = {
            r["token"]: r["n_occurrences"]
            for r in bpe_token_counts(df, rules, strategy=strategy).collect()
        }
        assert got == want, strategy


def test_bpe_token_counts_rejects_unknown_strategy(spark):
    df = spark.createDataFrame([("a b",)], "text string")
    with pytest.raises(ValueError):
        bpe_token_counts(df, [("a", "b")], strategy="nope")
