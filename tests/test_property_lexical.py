"""Randomized equivalence for the r7 lexical operators against
brute-force python oracles (hypothesis): span dedup (both physical
strategies) and BM25 scoring on arbitrary tiny corpora — tiny token
domains force chunk collisions, shared vocabulary, ragged tails and
repeated query terms.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from semantic_vector_search_system_spark.operators.lexical import (
    bm25_scores,
    span_dedup,
)


def py_span_dedup(docs, k):
    """Brute force: chunk every doc into k-token chunks, keep globally
    first (doc_id, pos) occurrence per distinct chunk, reassemble."""
    chunks = []  # (doc_id, pos, chunk)
    n_chunks = {}
    for did in sorted(docs):
        toks = docs[did].split()
        n = (len(toks) + k - 1) // k
        n_chunks[did] = n
        for p in range(n):
            chunks.append((did, p, " ".join(toks[p * k : (p + 1) * k])))
    seen = set()
    kept = {}
    for did, p, ch in sorted(chunks):  # (doc_id, pos) order = keep-first
        if ch not in seen:
            seen.add(ch)
            kept.setdefault(did, []).append((p, ch))
    out = {}
    for did in docs:
        ks = kept.get(did, [])
        out[did] = (
            n_chunks[did],
            len(ks),
            " ".join(ch for _, ch in sorted(ks)),
        )
    return out


def py_bm25(docs, queries, k1=1.2, b=0.75):
    dtoks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in dtoks.values()) / n
    df = {}
    for toks in dtoks.values():
        for tok in set(toks):
            df[tok] = df.get(tok, 0) + 1
    idf = {t: (n - c + 0.5) / (c + 0.5) for t, c in df.items()}
    out = {}
    for qid, qtext in queries.items():
        qtf = {}
        for tok in qtext.split():
            qtf[tok] = qtf.get(tok, 0) + 1
        for did, toks in dtoks.items():
            tf = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            s, hit = 0.0, False
            for tok, qc in qtf.items():
                if tok in tf:
                    hit = True
                    c, dl = tf[tok], len(toks)
                    s += (
                        (idf[tok] * (c * (k1 + 1)))
                        / (c + k1 * ((1 - b) + b * (dl / avgdl)))
                    ) * qc
            if hit:
                out[(qid, did)] = s
    return out


TOKENS = ["aa", "bb", "cc", "dd"]


@st.composite
def corpus_case(draw):
    n_docs = draw(st.integers(min_value=1, max_value=6))
    docs = {}
    for i in range(n_docs):
        n_tok = draw(st.integers(min_value=1, max_value=9))
        docs[i] = " ".join(
            draw(st.sampled_from(TOKENS)) for _ in range(n_tok)
        )
    return docs


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_case(), k=st.integers(min_value=1, max_value=4))
def test_span_dedup_both_strategies_match_python_oracle(spark, docs, k):
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    want = py_span_dedup(docs, k)
    for strat in ("chunks", "keys"):
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dedup_text"])
            for r in span_dedup(df, span_tokens=k, shuffle=strat).collect()
        }
        assert got == want, (strat, docs, k)


@pytest.mark.usefixtures("spark")
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=corpus_case(), qtext=st.lists(st.sampled_from(TOKENS), min_size=1, max_size=4))
def test_bm25_scores_match_python_oracle(spark, docs, qtext):
    queries = {0: " ".join(qtext)}
    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    qf = spark.createDataFrame(list(queries.items()), "qid long, text string")
    want = py_bm25(docs, queries)
    got = {
        (r["qid"], r["docid"]): r["score"]
        for r in bm25_scores(df, qf, max_df_ratio=1.0).collect()
    }
    assert set(got) == set(want), (docs, qtext)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=1e-9), (key, docs)
