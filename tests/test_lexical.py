"""Unit tests for operators/lexical.py: BM25 retrieval and span dedup.

BM25 is checked against a transparent pure-python oracle on a small
fixture (and its stopword cut on a skewed one); span dedup against
hand-computable planted-duplicate fixtures plus a partitioning-invariance
check (the catalog oracle covers the full relational semantics at scale).
"""

import math

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.lexical import (
    bm25_scores,
    bm25_topk,
    span_dedup,
)


def _py_bm25(docs, queries, k1=1.2, b=0.75, max_df_ratio=0.5):
    """Transparent reference implementation (dict-of-floats)."""
    dtoks = {i: t.split() for i, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in dtoks.values()) / n
    df = {}
    for toks in dtoks.values():
        for tok in set(toks):
            df[tok] = df.get(tok, 0) + 1
    idf = {
        t: (n - c + 0.5) / (c + 0.5)
        for t, c in df.items()
        if c <= max_df_ratio * n
    }
    out = {}
    for qid, qtext in queries.items():
        qtf = {}
        for tok in qtext.split():
            qtf[tok] = qtf.get(tok, 0) + 1
        for docid, toks in dtoks.items():
            tf = {}
            for tok in toks:
                tf[tok] = tf.get(tok, 0) + 1
            s = 0.0
            hit = False
            for tok, qc in qtf.items():
                if tok in idf and tok in tf:
                    hit = True
                    c = tf[tok]
                    dl = len(toks)
                    s += (
                        (idf[tok] * (c * (k1 + 1)))
                        / (c + k1 * ((1 - b) + b * (dl / avgdl)))
                    ) * qc
            if hit:
                out[(qid, docid)] = s
    return out


DOCS = {
    0: "spark join merge sort spark spark",
    1: "join merge window scan",
    2: "sort sort sort sort sort sort sort sort sort sort",
    3: "spark window",
    4: "scan batch stream filter group agg",
}
QUERIES = {100: "spark sort", 101: "window scan scan"}


def _mk(spark, data, idc, tc):
    return spark.createDataFrame(
        [(i, t) for i, t in data.items()], f"{idc} long, {tc} string"
    )


def test_bm25_matches_python_oracle(spark):
    got = {
        (r["qid"], r["docid"]): r["score"]
        for r in bm25_scores(
            _mk(spark, DOCS, "doc_id", "text"),
            _mk(spark, QUERIES, "qid", "text"),
            max_df_ratio=1.0,
        ).collect()
    }
    want = _py_bm25(DOCS, QUERIES, max_df_ratio=1.0)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-9), k


def test_bm25_tf_saturation_and_length_norm(spark):
    rows = bm25_topk(
        _mk(spark, DOCS, "doc_id", "text"),
        _mk(spark, QUERIES, "qid", "text"),
        k=5,
        max_df_ratio=1.0,
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], {})[r["docid"]] = (r["rank"], r["score"])
    # qid 100 ("spark sort"): doc 0 (3x spark + 1x sort, short) must beat
    # doc 2 (10x sort only — tf saturates AND dl penalizes) and doc 3
    # (1x spark only).
    assert by_q[100][0][0] == 1
    assert by_q[100][0][1] > by_q[100][2][1]
    assert by_q[100][0][1] > by_q[100][3][1]
    # qid 101 ("window scan scan"): doc 1 has both terms -> rank 1.
    assert by_q[101][1][0] == 1
    # docs with no query term never appear
    assert 4 not in by_q[100]


def test_bm25_stopword_cut_drops_high_df_terms(spark):
    # "common" appears in every doc; with max_df_ratio=0.5 it must not
    # contribute — doc 9 (only "common") gets no row at all.
    docs = {i: f"common word{i}" for i in range(9)}
    docs[9] = "common common common"
    queries = {0: "common word3"}
    got = bm25_scores(
        _mk(spark, docs, "doc_id", "text"),
        _mk(spark, queries, "qid", "text"),
        max_df_ratio=0.5,
    ).collect()
    assert {r["docid"] for r in got} == {3}  # only the rare-term match


def test_span_dedup_keeps_first_occurrence(spark):
    k = 3
    # doc 0 chunks: "a b c" / "d e f"; doc 1 repeats "a b c" then fresh;
    # doc 2 is doc 0 verbatim (fully deduped away); doc 3 repeats its own
    # first chunk.
    docs = {
        0: "a b c d e f",
        1: "a b c x y z",
        2: "a b c d e f",
        3: "p q r p q r",
    }
    out = {
        r["doc_id"]: r
        for r in span_dedup(
            _mk(spark, docs, "doc_id", "text"), span_tokens=k
        ).collect()
    }
    assert len(out) == 4  # every input doc present
    assert out[0]["dedup_text"] == "a b c d e f"
    assert (out[0]["n_chunks"], out[0]["n_kept"]) == (2, 2)
    assert out[1]["dedup_text"] == "x y z"
    assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 1)
    assert out[2]["dedup_text"] == ""
    assert (out[2]["n_chunks"], out[2]["n_kept"]) == (2, 0)
    assert out[3]["dedup_text"] == "p q r"
    assert (out[3]["n_chunks"], out[3]["n_kept"]) == (2, 1)


def test_span_dedup_ragged_tail_chunk(spark):
    docs = {0: "a b c d", 1: "c d"}  # doc 0 tail chunk "d"; doc 1 = "c d"
    out = {
        r["doc_id"]: r
        for r in span_dedup(
            _mk(spark, docs, "doc_id", "text"), span_tokens=3
        ).collect()
    }
    assert out[0]["dedup_text"] == "a b c d"
    assert out[0]["n_chunks"] == 2
    assert out[1]["dedup_text"] == "c d"  # distinct chunk, survives


def test_span_dedup_partitioning_invariant(spark):
    docs = {i: " ".join(f"w{(i * 7 + j) % 11}" for j in range(25)) for i in range(40)}
    df = _mk(spark, docs, "doc_id", "text")
    a = sorted(
        map(tuple, span_dedup(df.repartition(1), span_tokens=5).collect())
    )
    b = sorted(
        map(tuple, span_dedup(df.repartition(13), span_tokens=5).collect())
    )
    assert a == b


def test_bm25_materialized_postings_single_corpus_token_pass(spark):
    """The 100 TB contract of bm25_scores(materialize_tf=True): the raw
    corpus text is tokenized/shuffled ONCE into the checkpointed postings
    relation; dl/df/scoring consume the materialized postings (measured on
    the declarative form: column pruning defeats exchange reuse and the
    corpus was scanned 6x, the explode+shuffle running 3x)."""
    import re

    docs = _mk(spark, DOCS, "doc_id", "text")
    queries = _mk(spark, QUERIES, "qid", "text")
    plan = (
        bm25_scores(docs, queries, max_df_ratio=1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the doc-side explode appears only in the (already-run) checkpoint
    # lineage, not in the serving plan
    assert len(re.findall(r"explode", plan, flags=re.I)) <= 1, plan[:2000]
    assert plan.count("Scan ExistingRDD") >= 2  # postings read from memory


def test_span_dedup_strategy_parity(spark):
    """Both physical strategies (chunk-text shuffle vs ints-only shuffle
    + re-slice) produce identical rows on a fixture with cross-doc dups,
    intra-doc dups, ragged tails and full elimination."""
    docs = {
        0: "a b c d e f",
        1: "a b c x y z",
        2: "a b c d e f",
        3: "p q r p q r",
        4: "lone tail",
        5: " ".join(f"t{i % 4}" for i in range(17)),
    }
    df = _mk(spark, docs, "doc_id", "text")
    a = sorted(map(tuple, span_dedup(df, span_tokens=3, shuffle="chunks").collect()))
    b = sorted(map(tuple, span_dedup(df, span_tokens=3, shuffle="keys").collect()))
    assert a == b

    with pytest.raises(ValueError):
        span_dedup(df, shuffle="bogus")


def test_span_dedup_keep_first_agg_vs_window_parity_planted_skew(spark):
    """De-skewed keep-first (r7 VERDICT #1): on a corpus where ONE
    boilerplate chunk opens a third of the documents, the min-struct
    AGGREGATE form produces exactly the legacy window form's rows for
    both shuffle strategies — and its physical plan carries a
    partial_min BEFORE the chunk-hash exchange (map-side combine: the
    hot key collapses to one candidate row per scan partition instead
    of shipping the full duplication factor to a single reducer)."""
    docs = {}
    for i in range(300):
        body = " ".join(f"u{i}w{j}" for j in range(6))
        # chunk-aligned boilerplate: exactly one span_tokens=3 chunk
        docs[i] = ("nav header boiler " + body) if i % 3 == 0 else body
    df = _mk(spark, docs, "doc_id", "text")
    for strat in ("chunks", "keys"):
        agg = sorted(map(tuple, span_dedup(
            df, span_tokens=3, shuffle=strat, keep_first="agg"
        ).collect()))
        win = sorted(map(tuple, span_dedup(
            df, span_tokens=3, shuffle=strat, keep_first="window"
        ).collect()))
        assert agg == win
        plan = (
            span_dedup(df, span_tokens=3, shuffle=strat)
            ._jdf.queryExecution().executedPlan().toString()
        )
        final = plan.split("== Initial Plan ==")[0]
        assert "partial_min" in final, final[:2000]

    with pytest.raises(ValueError):
        span_dedup(df, keep_first="bogus")


def test_span_dedup_arrow_chunker_bitwise_parity(spark):
    """chunker="arrow" (r15, the 1M bench face: one mapInPandas pass with
    per-distinct-chunk memoized md5 digests) produces EXACTLY the expr
    face's rows — pinned on cross-doc dups, intra-doc dups, ragged tails,
    full elimination, empty/whitespace-only/null text, exact-multiple
    lengths, repeated boilerplate (the memo hot path) and unicode
    whitespace (NBSP must NOT split: Java \\s is ASCII-only, so the
    kernel must use py_tokenize, not str.split)."""
    docs = {
        0: "a b c d e f",
        1: "a b c x y z",
        2: "a b c d e f",            # full duplicate of 0
        3: "p q r p q r",            # intra-doc dup
        4: "lone tail",              # ragged single chunk
        5: " ".join(f"t{i % 4}" for i in range(17)),
        6: "",                       # zero tokens
        7: "   \t\n  ",              # whitespace-only: zero tokens
        8: "x y z w",           # NBSP inside a token (ASCII \\s parity)
        9: "a b c d e f g h i",      # exact multiple of span_tokens=3
        10: "nav boiler one nav boiler one nav boiler one",  # memo hot path
        11: None,                    # null text
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], "doc_id long, text string"
    )
    expr = sorted(
        map(tuple, span_dedup(df, span_tokens=3, chunker="expr").collect()),
        key=str,
    )
    arrow = sorted(
        map(tuple, span_dedup(df, span_tokens=3, chunker="arrow").collect()),
        key=str,
    )
    assert expr == arrow
    # the arrow plan replaces the posexplode chain with one Python stage
    import re as _re

    plan = (
        span_dedup(df, span_tokens=3, chunker="arrow")
        ._jdf.queryExecution().executedPlan().toString()
    )
    final = plan.split("== Initial Plan ==")[0]
    assert not _re.search(r"Generate posexplode", final), final[:2000]
    with pytest.raises(ValueError):
        span_dedup(df, chunker="bogus")
    with pytest.raises(ValueError):
        span_dedup(df, chunker="arrow", shuffle="keys")


def test_span_dedup_null_and_empty_text(spark):
    """Null text: chunking yields no rows, the left join keeps the doc
    with null n_chunks / 0 kept / empty dedup_text — same contract as the
    DuckDB oracle (NULL propagates through len/ceil, UNNEST drops)."""
    df = spark.createDataFrame(
        [(0, "a b c"), (1, None)], "doc_id long, text string"
    )
    for strat in ("chunks", "keys"):
        out = {
            r["doc_id"]: r
            for r in span_dedup(df, span_tokens=2, shuffle=strat).collect()
        }
        assert out[0]["dedup_text"] == "a b c"
        assert out[1]["n_chunks"] is None
        assert out[1]["n_kept"] == 0
        assert out[1]["dedup_text"] == ""


def test_bm25_null_text_doc_is_ignored(spark):
    """A null-text doc contributes no postings and no dl row; scoring
    simply never surfaces it (no crash, no null scores)."""
    docs = dict(DOCS)
    df = spark.createDataFrame(
        [(i, t) for i, t in docs.items()] + [(99, None)],
        "doc_id long, text string",
    )
    rows = bm25_topk(
        df, _mk(spark, QUERIES, "qid", "text"), k=10, max_df_ratio=1.0
    ).collect()
    assert all(r["docid"] != 99 for r in rows)
    assert all(r["score"] is not None for r in rows)


def test_bm25_index_roundtrip_and_serving_parity(spark, tmp_path):
    """write_bm25_index -> bm25_topk_from_index serves EXACTLY what the
    from-scratch bm25_topk computes (same weights, ranks and scores) —
    and the serving plan never shuffles the postings scan (the query
    side broadcasts; the only exchanges sit above the join on the
    bounded matched rows)."""
    import re

    docs = _mk(spark, DOCS, "doc_id", "text")
    queries = _mk(spark, QUERIES, "qid", "text")
    from semantic_vector_search_system_spark.operators.lexical import (
        bm25_topk_from_index,
        write_bm25_index,
    )

    spark.sql("DROP TABLE IF EXISTS t_bm25_postings")
    spark.sql("DROP TABLE IF EXISTS t_bm25_meta")
    meta = write_bm25_index(docs, "t_bm25", max_df_ratio=1.0)
    assert meta["k1"] == 1.2
    try:
        served = bm25_topk_from_index(spark, "t_bm25", queries, k=5)
        scratch = bm25_topk(docs, queries, k=5, max_df_ratio=1.0)
        assert sorted(map(tuple, served.collect())) == sorted(
            map(tuple, scratch.collect())
        )
        # plan gate: the postings side of the join is the bare table scan
        # (query terms broadcast; the index never shuffles). In the final
        # adaptive plan the 3 hashpartitioning exchanges are the tiny
        # query-side qtf agg, the per-pair sum, and the rank window —
        # and the probe chain from BroadcastHashJoin down to the postings
        # FileScan contains no exchange (build-side lines print with ':'
        # tree pipes; probe-chain lines don't).
        plan = served._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        m = re.search(r"Scan parquet[^\n]*t_bm25_postings", final)
        assert m, final[:1500]
        assert "Bucketed: true" in final
        assert final.count("Exchange hashpartitioning") <= 3, final[:2500]
        join_pos = final.find("BroadcastHashJoin")
        assert 0 <= join_pos < m.start(), "scan must sit under the join"
        for ln in final[join_pos : m.start()].split("\n")[1:]:
            body = ln.lstrip(" +-")
            if ln.lstrip().startswith(":"):
                continue  # build (broadcast query) subtree
            assert "Exchange hashpartitioning" not in body, ln
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bm25_postings")
        spark.sql("DROP TABLE IF EXISTS t_bm25_meta")


def test_incremental_span_dedup_equals_full_corpus_run(spark):
    """The crawl-loop contract: processing a corpus as doc_id-ordered
    batches through incremental_span_dedup (stored chunk-hash index
    updated per batch) yields EXACTLY span_dedup of the whole corpus."""
    from semantic_vector_search_system_spark.operators.lexical import (
        incremental_span_dedup,
        write_span_index,
    )

    docs = {
        i: " ".join(f"w{(i * 3 + j) % 7}" for j in range(10)) for i in range(30)
    }
    docs[5] = docs[2]      # cross-batch full duplicate
    docs[17] = docs[2]     # duplicate across the batch boundary
    docs[23] = docs[20] + " unique tail words here"
    df = _mk(spark, docs, "doc_id", "text")
    full = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["dedup_text"])
        for r in span_dedup(df, span_tokens=4).collect()
    }

    for t in ("inc_span_chunks", "inc_span_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        # seed the index EMPTY (limit(0)) then feed batches in doc_id order
        write_span_index(df.limit(0), "inc_span", span_tokens=4)
        got = {}
        for lo in range(0, 30, 10):
            batch = df.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 10)
            )
            for r in incremental_span_dedup(batch, "inc_span").collect():
                got[r["doc_id"]] = (
                    r["n_chunks"], r["n_kept"], r["dedup_text"]
                )
        assert got == full
    finally:
        for t in ("inc_span_chunks", "inc_span_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_span_dedup_respects_prebuilt_corpus_index(spark):
    """A batch against a PREBUILT corpus index: chunks already in the
    corpus are dropped, novel ones survive; with update_index=False the
    index is untouched (same batch replays identically)."""
    from semantic_vector_search_system_spark.operators.lexical import (
        incremental_span_dedup,
        write_span_index,
    )

    corpus = _mk(spark, {0: "a b c d e f", 1: "p q r s t u"}, "doc_id", "text")
    batch = _mk(
        spark,
        {10: "a b c x y z", 11: "a b c d e f", 12: "fresh words only"},
        "doc_id",
        "text",
    )
    for t in ("pre_span_chunks", "pre_span_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_span_index(corpus, "pre_span", span_tokens=3)
        for _ in range(2):  # replay: update_index=False leaves state alone
            out = {
                r["doc_id"]: r
                for r in incremental_span_dedup(
                    batch, "pre_span", update_index=False
                ).collect()
            }
            assert out[10]["dedup_text"] == "x y z"
            assert out[11]["dedup_text"] == ""      # fully known
            assert out[12]["dedup_text"] == "fresh words only"
            assert (out[12]["n_chunks"], out[12]["n_kept"]) == (1, 1)
    finally:
        for t in ("pre_span_chunks", "pre_span_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
