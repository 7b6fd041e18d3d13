"""Unit tests for operators/quality_filters.py against hand-computed and
Python-oracle values (catalog oracles cover the DuckDB twins)."""

from __future__ import annotations

import pytest

from semantic_vector_search_system_spark.operators import quality_filters as qf


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_hand_computed(spark):
    # "a b a b a" -> tokens=5; 2-grams: [a b, b a, a b, b a] -> 2/4 dup;
    # 3-grams: [a b a, b a b, a b a] -> 1/3 dup; top token a: 3/5;
    # mean token len 1.0; stopwords: 'a' x3 -> 3/5.
    out = {
        r.doc_id: r
        for r in qf.repetition_stats(_docs(spark, [(1, "a b a b a")])).collect()
    }
    r = out[1]
    assert r.n_tokens == 5
    assert r.dup_2gram_frac == pytest.approx(0.5)
    assert r.dup_3gram_frac == pytest.approx(1 / 3, abs=1e-6)
    assert r.top_token_frac == pytest.approx(0.6)
    assert r.mean_token_len == pytest.approx(1.0)
    assert r.stopword_ratio == pytest.approx(0.6)


def test_repetition_stats_short_doc_single_shingle(spark):
    # 1 token: single whole-text shingle for every n -> dup fraction 0
    r = qf.repetition_stats(_docs(spark, [(1, "hello")])).collect()[0]
    assert r.n_tokens == 1
    assert r.dup_2gram_frac == 0.0 and r.dup_3gram_frac == 0.0
    assert r.top_token_frac == 1.0


def test_repetition_stats_empty_and_whitespace_docs(spark):
    """Empty/whitespace-only docs must not DIVIDE_BY_ZERO under ANSI mode;
    ratios default to 0.0 and too_short still trips."""
    flags = {
        r.doc_id: r
        for r in qf.gopher_quality_flags(
            _docs(spark, [(1, ""), (2, "   \t \n "), (3, "a b")])
        ).collect()
    }
    for doc_id in (1, 2):
        r = flags[doc_id]
        assert r.n_tokens == 0
        assert r.top_token_frac == 0.0
        assert r.mean_token_len == 0.0
        assert r.stopword_ratio == 0.0
        assert r.too_short and not r.keep


def test_gopher_flags_keep_logic(spark):
    rows = [
        (1, " ".join(f"tok{i:02d}word" for i in range(60))),  # clean: keep
        (2, "spam " * 50),  # top_token_dominant + high_repetition + short toks
        (3, "one two"),  # too_short
    ]
    out = {r.doc_id: r for r in qf.gopher_quality_flags(_docs(spark, rows)).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].top_token_dominant and out[2].high_repetition
    assert not out[3].keep and out[3].too_short


def test_pii_scan_and_redact(spark):
    rows = [
        (1, "mail me at jane.doe+x@sub.example.org or call +1 (415) 555-0100 ok"),
        (2, "server at 10.0.0.1 and 256.1.2.3 online"),  # both match the naive ipv4 shape
        (3, "no pii here at all"),
    ]
    d = _docs(spark, rows)
    s = {r.doc_id: r for r in qf.pii_scan(d).collect()}
    assert s[1].n_email == 1 and s[1].n_phone == 1 and s[1].n_ipv4 == 0
    assert s[2].n_ipv4 == 2 and s[2].n_email == 0
    assert s[3].n_pii == 0
    red = {r.doc_id: r.text for r in qf.pii_redact(d).collect()}
    assert "[PII]" in red[1] and "jane" not in red[1] and "555" not in red[1]
    assert red[1].startswith("mail me at ") and red[1].endswith(" ok")
    assert red[3] == "no pii here at all"
    # scanning redacted text finds nothing
    resc = qf.pii_scan(qf.pii_redact(d)).collect()
    assert all(r.n_pii == 0 for r in resc)


def test_decontaminate_exact_overlap(spark):
    # doc 1 contains the eval 8-gram verbatim; doc 2 shares no 8-gram
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = _docs(
        spark,
        [(1, f"prefix {shared} suffix"), (2, "x1 x2 x3 x4 x5 x6 x7 x8 x9")],
    )
    evals = spark.createDataFrame([(100, shared)], "eval_id long, text string")
    out = {r.doc_id: r for r in qf.decontaminate(docs, evals, n=8).collect()}
    assert set(out) == {1}
    assert out[1].n_overlap_shingles == 1 and out[1].n_eval_hits == 1


def test_decontaminate_counts_distinct_eval_hits(spark):
    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    docs = _docs(spark, [(1, f"{shared} tail1 tail2")])
    evals = spark.createDataFrame(
        [(100, shared), (200, f"head {shared}")], "eval_id long, text string"
    )
    out = qf.decontaminate(docs, evals, n=8).collect()[0]
    assert out.n_eval_hits == 2 and out.n_overlap_shingles == 1


def test_decontaminate_planted_contamination_property(spark):
    """r8 VERDICT #6: plant an eval shingle into a CHOSEN subset of k
    docs — exactly those docs must be flagged, with per-doc overlap
    counts matching a python shingle oracle, under randomized corpus
    composition (clean docs, multi-hit docs, sub-n short docs, eval
    items sharing shingles with each other)."""
    import random

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    @given(seed=st.integers(min_value=0, max_value=10_000))
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def run(seed):
        rng = random.Random(seed)
        n = 5
        eval_rows = [
            (100 + e, " ".join(f"ev{e}_{j}" for j in range(rng.randint(3, 9))))
            for e in range(3)
        ]
        doc_rows, want = [], {}
        for d in range(12):
            words = [f"d{d}_{j}" for j in range(rng.randint(0, 14))]
            hits = set()
            if rng.random() < 0.5:  # contaminate with 1-2 eval snippets
                for e in rng.sample(range(3), rng.randint(1, 2)):
                    etoks = eval_rows[e][1].split()
                    if len(etoks) >= n:
                        pos = rng.randint(0, len(words))
                        words[pos:pos] = etoks
            doc_rows.append((d, " ".join(words)))
        # python oracle: distinct n-shingle overlap per (doc, eval)
        def shingles(text):
            t = text.split()
            if not t:
                return set()
            if len(t) < n:
                return {" ".join(t)}
            return {" ".join(t[i : i + n]) for i in range(len(t) - n + 1)}

        ev_sh = {eid: shingles(t) for eid, t in eval_rows}
        for did, t in doc_rows:
            dsh = shingles(t)
            overlap = {s for s in dsh if any(s in es for es in ev_sh.values())}
            hits = {eid for eid, es in ev_sh.items() if dsh & es}
            if overlap:
                want[did] = (len(overlap), len(hits))
        docs = _docs(spark, doc_rows)
        evals = spark.createDataFrame(eval_rows, "eval_id long, text string")
        got = {
            r.doc_id: (r.n_overlap_shingles, r.n_eval_hits)
            for r in qf.decontaminate(docs, evals, n=n).collect()
        }
        assert got == want

    run()


def test_linear_quality_margin_matches_python(spark):
    """No-weights (hash stand-in) path vs a transparent python oracle."""
    import hashlib

    from semantic_vector_search_system_spark.operators.quality_filters import (
        linear_quality_margin,
    )

    docs = {0: "alpha beta gamma", 1: "delta", 2: "alpha alpha beta"}
    df = spark.createDataFrame(
        [(i, t, f"s{i % 2}") for i, t in docs.items()],
        "doc_id long, text string, source string",
    )

    def w(tok):
        h = int(hashlib.md5(("qw1" + tok).encode()).hexdigest()[:15], 16)
        return (h % 2001 - 1000) / 1000.0

    got = {
        r["doc_id"]: r
        for r in linear_quality_margin(df, extra_cols=("source",)).collect()
    }
    for i, text in docs.items():
        toks = text.split()
        want = sum(round(w(t), 12) for t in toks) / len(toks)
        assert got[i]["n_tokens"] == len(toks)
        assert got[i]["margin"] == pytest.approx(want, abs=1e-9)
        assert got[i]["accept"] == (got[i]["margin"] > 0)
        assert got[i]["source"] == f"s{i % 2}"


def test_linear_quality_margin_fast_face_bitwise_parity(spark):
    """strategy="fast" (r14: the Arrow kernel with memoized digests, the
    10^8-token bench path) is BITWISE-identical to the expr face's
    DECIMAL fold — exercised over real corpus text plus the edge cases
    that distinguish the faces: empty text, whitespace-only text (both
    dropped), unicode whitespace (tokenizer-class parity), repeated
    tokens (the Counter path), and a negative-margin doc."""
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.datagen import generate_documents
    from semantic_vector_search_system_spark.operators.quality_filters import (
        linear_quality_margin,
    )

    docs = generate_documents(spark, 500, seed=11, num_partitions=4)
    edge = spark.createDataFrame(
        [
            ("e1", ""),
            ("e2", "   "),
            ("e3", "alpha beta gamma"),
            ("e4", "alpha alpha alpha beta"),
            ("e5", "zq zq zq"),
        ],
        "id string, text string",
    )
    df = docs.select("id", "text").unionByName(edge)
    expr_rows = sorted(
        map(tuple, linear_quality_margin(df, id_col="id").collect())
    )
    fast_rows = sorted(
        map(
            tuple,
            linear_quality_margin(df, id_col="id", strategy="fast").collect(),
        )
    )
    assert expr_rows == fast_rows
    assert len(expr_rows) == 503  # e1/e2 dropped by both faces
    # extra_cols ride through the fast face too
    fast_x = linear_quality_margin(
        df.withColumn("src", F.lit("s")), id_col="id",
        extra_cols=("src",), strategy="fast",
    ).columns
    assert fast_x == ["id", "src", "n_tokens", "margin", "accept"]


def test_linear_quality_margin_real_weight_table_path(spark):
    """A real (tok, w) weight table broadcast-joins through the same
    operator: known weights -> exact margins; unknown tokens weigh 0."""
    from semantic_vector_search_system_spark.operators.quality_filters import (
        linear_quality_margin,
    )

    df = spark.createDataFrame(
        [(0, "good good bad"), (1, "bad bad unseen"), (2, "unseen")],
        "doc_id long, text string",
    )
    weights = spark.createDataFrame(
        [("good", 0.9), ("bad", -0.6)], "tok string, w double"
    )
    got = {
        r["doc_id"]: r for r in linear_quality_margin(df, weights).collect()
    }
    assert got[0]["margin"] == pytest.approx((0.9 + 0.9 - 0.6) / 3)
    assert got[0]["accept"] is True
    assert got[1]["margin"] == pytest.approx((-0.6 - 0.6 + 0.0) / 3)
    assert got[1]["accept"] is False
    assert got[2]["margin"] == pytest.approx(0.0)
    assert got[2]["accept"] is False  # strict > 0


def test_linear_quality_margin_no_weights_plan_is_narrow(spark):
    """The no-weights path's 100 TB contract: the margin is a pure
    per-row fold — no explode, no shuffle; the only exchange in the
    catalog report query is the final source-keyed aggregation."""
    from semantic_vector_search_system_spark.operators.quality_filters import (
        linear_quality_margin,
    )

    df = spark.createDataFrame(
        [(0, "a b c", "s0"), (1, "d e", "s1")],
        "doc_id long, text string, source string",
    )
    plan = (
        linear_quality_margin(df, extra_cols=("source",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan[:1500]
    assert "Generate" not in plan  # no explode


# ---------------------------------------------------------------------------
# Bigram-LM fluency scoring (operators/lm.py)
# ---------------------------------------------------------------------------

def test_bigram_lm_hand_computed(spark):
    """Tiny corpus with hand-computed smoothed likelihoods: cnt2 counts
    bigram occurrences, cnt1 is the bigram-start sum (NOT raw token
    count), vocab is distinct tokens, ratio = (c12+1)/(c1+V)."""
    from semantic_vector_search_system_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
    )

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a b"), (3, "solo"), (4, None), (5, "  ")],
        "doc_id bigint, text string",
    )
    model = train_bigram_lm(docs)
    cnt2, cnt1, vocab = model
    assert {(r["w1"], r["w2"]): r["c12"] for r in cnt2.collect()} == {
        ("a", "b"): 2, ("b", "a"): 1
    }
    assert {r["w1"]: r["c1"] for r in cnt1.collect()} == {"a": 2, "b": 1}
    assert vocab.first()["vs"] == 3  # a, b, solo

    out = {r["doc_id"]: r for r in bigram_lm_score(docs, model).collect()}
    # docs 3 (one token), 4 (null), 5 (whitespace) have no bigrams
    assert set(out) == {1, 2}
    # d1: mean((2+1)/(2+3), (1+1)/(1+3)) = (0.6 + 0.5)/2 = 0.55
    assert out[1]["n_bigrams"] == 2 and out[1]["lm_score"] == 0.55
    # d2: (2+1)/(2+3) = 0.6
    assert out[2]["n_bigrams"] == 1 and out[2]["lm_score"] == 0.6


def test_bigram_lm_matches_python_oracle(spark):
    """Seeded random word corpus vs a python reference replaying count,
    smooth, round-12, exact-mean semantics."""
    import random
    from decimal import Decimal

    from semantic_vector_search_system_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
    )

    rng = random.Random(13)
    words = [f"w{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(words) for _ in range(rng.randint(0, 12)))
        for i in range(80)
    }

    cnt2: dict = {}
    cnt1: dict = {}
    vocab = set()
    for t in texts.values():
        toks = t.split()
        vocab.update(toks)
        for a, b in zip(toks, toks[1:]):
            cnt2[(a, b)] = cnt2.get((a, b), 0) + 1
            cnt1[a] = cnt1.get(a, 0) + 1
    vs = len(vocab)

    def py_score(t):
        toks = t.split()
        rs = [
            Decimal(round((cnt2[(a, b)] + 1) / (cnt1[a] + vs), 12)).quantize(
                Decimal("1e-12")
            )
            for a, b in zip(toks, toks[1:])
        ]
        if not rs:
            return None
        return (len(rs), round(float(sum(rs)) / len(rs), 6))

    expect = {i: py_score(t) for i, t in texts.items() if py_score(t)}

    docs = spark.createDataFrame(
        list(texts.items()), "doc_id bigint, text string"
    )
    model = train_bigram_lm(docs)
    got = {r["doc_id"]: (r["n_bigrams"], r["lm_score"])
           for r in bigram_lm_score(docs, model).collect()}
    assert got == expect
    assert len(got) >= 60


def test_bigram_lm_broadcasts_counts_and_survives_token_skew(spark):
    """r7 VERDICT #4: natural-language bigrams are Zipfian on w1, so the
    count joins must broadcast the vocabulary-bounded relations instead
    of shuffling the exploded corpus on a skewed key. Asserts (a) the
    default plan joins cnt1 via BroadcastHashJoin with ZERO shuffle of
    the exploded bigram side before the per-doc agg when both counts
    broadcast, (b) a "the"-heavy corpus (one token starting ~half of all
    bigrams) scores identically under none/cnt1/both strategies and any
    partitioning."""
    import pytest as _pytest

    from semantic_vector_search_system_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
    )

    # skewed corpus: "the" begins ~50% of bigrams
    docs = spark.createDataFrame(
        [
            (i, " ".join(f"the w{(i * 7 + j) % 13}" for j in range(6)))
            for i in range(120)
        ],
        "doc_id bigint, text string",
    )
    model = train_bigram_lm(docs)

    def rows(bc, df=docs):
        return sorted(
            map(
                tuple,
                bigram_lm_score(df, model, broadcast_counts=bc).collect(),
            )
        )

    base = rows("cnt1")
    assert rows("none") == base
    assert rows("both") == base
    assert rows("cnt1", docs.repartition(17)) == base

    # plan gates: the skew-exposed joins are BROADCAST hash joins on the
    # exploded (corpus-sized) probe side — the single-w1 join (the "the"
    # hot key) under the default, plus the (w1, w2) join under "both".
    # (Exchange counts are NOT asserted globally: the count relations'
    # own build subtrees legitimately aggregate with exchanges before
    # they broadcast.)
    import re

    final = (
        bigram_lm_score(docs, model)
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert re.search(
        r"BroadcastHashJoin \[w1#\d+\], \[w1#\d+\], LeftOuter", final
    ), final[:2500]
    both = (
        bigram_lm_score(docs, model, broadcast_counts="both")
        ._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert re.search(
        r"BroadcastHashJoin \[w1#\d+, w2#\d+\], \[w1#\d+, w2#\d+\], LeftOuter",
        both,
    ), both[:2500]
    assert re.search(
        r"BroadcastHashJoin \[w1#\d+\], \[w1#\d+\], LeftOuter", both
    ), both[:2500]

    with _pytest.raises(ValueError):
        bigram_lm_score(docs, model, broadcast_counts="bogus")


def test_bigram_lm_score_fast_face_bitwise_parity(spark):
    """strategy='fast' (Arrow kernel, r9b) must reproduce the expr face
    BITWISE — n_bigrams and lm_score both — including unicode-whitespace
    tokenization (NEL \\x85), empty/NULL/1-token drops, and repeated
    bigrams; 'auto' picks the kernel under the row bound and the expr
    face above it without changing results."""
    from semantic_vector_search_system_spark.operators.lm import (
        bigram_lm_score,
        train_bigram_lm,
    )

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "one"),          # 1 token: no bigram, dropped
        (4, ""),             # empty: dropped
        (5, None),           # NULL: dropped
        (6, "a b c\x85d e"), # NEL is NOT Java \s: 'c\x85d' is one token
        (7, "x y x y x y"),  # repeated bigrams exercise the memo path
        (8, "  padded   tokens  here "),
        (9, "unseen words entirely novel here now"),
    ]
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    train = docs.filter(F.col("doc_id") <= 2)
    cnt2, cnt1, vocab = train_bigram_lm(train)
    model = (
        cnt2.localCheckpoint(),
        cnt1.localCheckpoint(),
        spark.createDataFrame(
            [(int(vocab.collect()[0]["vs"]),)], "vs long"
        ),
    )

    def as_map(df):
        return {
            r["doc_id"]: (r["n_bigrams"], r["lm_score"]) for r in df.collect()
        }

    expr = as_map(bigram_lm_score(docs, model))
    fast = as_map(bigram_lm_score(docs, model, strategy="fast"))
    assert fast == expr
    assert set(expr) == {1, 2, 6, 7, 8, 9}
    # auto: kernel under the bound, expr joins above it — same results
    auto_small = as_map(bigram_lm_score(docs, model, strategy="auto"))
    auto_expr = as_map(
        bigram_lm_score(docs, model, strategy="auto", max_model_rows=1)
    )
    assert auto_small == expr and auto_expr == expr
    # the guard refuses an oversized model instead of collecting it
    with pytest.raises(ValueError, match="max_model_rows"):
        bigram_lm_score(docs, model, strategy="fast", max_model_rows=1)


def test_train_quality_perceptron_learns_separable_labels(spark):
    """The batch perceptron (r10) must actually LEARN: on a linearly
    separable corpus (good docs contain 'excellent', bad docs contain
    'terrible') the misclassified count reaches 0 within a few epochs,
    training early-stops, and the learned weights — served through
    linear_quality_margin — classify the training set perfectly."""
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.operators.quality_filters import (
        linear_quality_margin,
        train_quality_perceptron,
    )

    rows = []
    for i in range(40):
        filler = f"common words shared by every document number {i % 7}"
        if i % 2 == 0:
            rows.append((i, f"{filler} excellent prose truly excellent", True))
        else:
            rows.append((i, f"{filler} terrible spam really terrible", False))
    docs = spark.createDataFrame(rows, "doc_id long, text string, good boolean")
    weights, history = train_quality_perceptron(
        docs, label_col="good", epochs=10
    )
    assert history[0]["n_misclassified"] == 40  # w=0: everything updates
    assert history[-1]["n_misclassified"] == 0  # converged -> early stop
    assert len(history) < 10
    w = {r["tok"]: r["w"] for r in weights.collect()}
    assert w["excellent"] > 0 > w["terrible"]
    served = linear_quality_margin(
        docs,
        weights=weights.select("tok", F.col("w").cast("double").alias("w")),
    )
    got = {r["doc_id"]: r["accept"] for r in served.collect()}
    assert got == {i: (i % 2 == 0) for i in range(40)}


def test_train_quality_perceptron_integer_exact_and_zero_token_docs(spark):
    """Weights are integer-exact and partitioning-invariant; zero-token
    docs carry no features and are silently excluded from the epoch
    counts (the linear_quality_margin contract)."""
    from semantic_vector_search_system_spark.operators.quality_filters import (
        train_quality_perceptron,
    )

    rows = [
        (1, "alpha alpha beta", True),
        (2, "beta gamma", False),
        (3, "   ", True),  # zero tokens: no features, never counted
        (4, "alpha gamma gamma", True),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, good boolean")
    w1, h1 = train_quality_perceptron(docs, label_col="good", epochs=3)
    assert h1[0]["n_misclassified"] == 3  # doc 3 excluded
    w2, h2 = train_quality_perceptron(
        docs.repartition(7), label_col="good", epochs=3
    )
    assert h1 == h2
    assert {(r["tok"], r["w"]) for r in w1.collect()} == {
        (r["tok"], r["w"]) for r in w2.collect()
    }
    # epoch-1 weights are the class-difference counts: hand-check one run
    # (epoch 0 updates on EVERY doc): alpha: +2 (d1) +1 (d4) = +3
    allw = {r["tok"]: r["w"] for r in w1.collect()}
    assert all(isinstance(v, int) for v in allw.values())


def test_train_quality_perceptron_plan_shape(spark):
    """Scale gates for the trainer: the weights join is a BROADCAST
    (vocabulary-bounded side), and both per-epoch aggregations carry
    map-side partials (partial_sum / partial_count) so the corpus-keyed
    shuffles move combined rows, not raw token rows."""
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.operators.quality_filters import (
        train_quality_perceptron,
    )

    docs = spark.createDataFrame(
        [(i, f"tok{i % 3} tok{i % 5} filler", i % 2 == 0) for i in range(20)],
        "doc_id long, text string, good boolean",
    )
    weights, _ = train_quality_perceptron(
        docs, label_col="good", epochs=2, checkpoint=False
    )
    plan = weights._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # weights side broadcast
    assert "partial_sum" in plan        # map-side combine on the update agg
