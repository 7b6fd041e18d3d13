"""DSIR importance selection (operators/dsir.py): python-oracle parity,
target-likeness behavior, zero-token contract, and the broadcast plan
gate for the bucket-bounded count relations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.functions.hashing import stable_hash64_py
from semantic_vector_search_system_spark.operators.dsir import (
    dsir_topk,
    hashed_ngram_features,
)


def _docs(spark, texts, start=0):
    return spark.createDataFrame(
        [(start + i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_feats(text, n_buckets):
    toks = text.split()
    grams = list(toks) + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [stable_hash64_py(g) % n_buckets for g in grams]


def _py_dsir(raw, target, k, n_buckets):
    """Reference: add-one ratios over hashed unigram+bigram instances,
    round-12 per ratio, exact mean rounded to 6, top-k by (score desc,
    doc_id)."""
    from collections import Counter
    from decimal import Decimal

    ct, cr = Counter(), Counter()
    for _, t in target:
        ct.update(_py_feats(t, n_buckets))
    for _, t in raw:
        cr.update(_py_feats(t, n_buckets))
    tn, rn = sum(ct.values()), sum(cr.values())
    rep = []
    for did, t in raw:
        feats = _py_feats(t, n_buckets)
        if not feats:
            continue
        rs = [
            round(
                ((ct.get(f, 0) + 1.0) / (tn + n_buckets))
                / ((cr.get(f, 0) + 1.0) / (rn + n_buckets)),
                12,
            )
            for f in feats
        ]
        s = sum((Decimal(repr(r)) for r in rs), Decimal(0))
        rep.append((did, len(feats), round(float(s) / len(feats), 6)))
    rep.sort(key=lambda x: (-x[2], x[0]))
    return [
        (did, nf, sc, rank + 1) for rank, (did, nf, sc) in enumerate(rep[:k])
    ]


def test_matches_python_oracle(spark):
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    import random

    rng = random.Random(42)
    target = [(i, " ".join(rng.choices(words[:4], k=rng.randint(1, 12)))) for i in range(10)]
    raw = [
        (100 + i, " ".join(rng.choices(words, k=rng.randint(0, 15))))
        for i in range(30)
    ]
    got = [
        (r["doc_id"], r["n_feats"], r["dsir_score"], r["rank"])
        for r in dsir_topk(
            _docs(spark, [t for _, t in raw], 100),
            _docs(spark, [t for _, t in target], 0),
            k=8,
            n_buckets=64,
        )
        .orderBy("rank")
        .collect()
    ]
    assert got == _py_dsir(raw, target, k=8, n_buckets=64)


def test_target_vocab_doc_outranks_alien_vocab_doc(spark):
    target = _docs(spark, ["the quick brown fox jumps"] * 5)
    raw = _docs(
        spark,
        ["the quick brown fox", "zzz qqq xxx www", "the quick zzz"],
        100,
    )
    rows = {r["doc_id"]: r["rank"] for r in dsir_topk(raw, target, k=3).collect()}
    assert rows[100] < rows[102] < rows[101]


def test_zero_token_docs_never_selected(spark):
    target = _docs(spark, ["common words here"])
    raw = _docs(spark, ["", "   ", "common words"], 100)
    got = dsir_topk(raw, target, k=10).collect()
    assert [r["doc_id"] for r in got] == [102]


def test_feature_instances_weighted_by_occurrence(spark):
    # "a a a" emits 3 unigram + 2 bigram instances — counts, not a set
    df = _docs(spark, ["a a a"])
    n = hashed_ngram_features(df, 16).count()
    assert n == 5


def test_count_relations_broadcast_no_feat_shuffle(spark):
    """100 TB gate: both count relations join the exploded raw side as
    BroadcastHashJoin — no Exchange keyed on feat anywhere (the only
    hashpartitioning exchanges are doc-keyed aggregations)."""
    target = _docs(spark, ["tok one two"] * 4)
    raw = _docs(spark, ["tok three four", "five six"], 100)
    out = dsir_topk(raw, target, k=5)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert plan.count("BroadcastHashJoin") >= 2
    for seg in plan.split("Exchange hashpartitioning")[1:]:
        head = seg.split("\n")[0]
        assert "feat" not in head, head


def test_fast_strategy_bitwise_identical(spark):
    """The Arrow-kernel face reproduces the expression face exactly:
    same memoized md5 bucketing, exact integer ratio sums, identical
    cast/divide/round chain."""
    import random

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota"]
    rng = random.Random(9)
    target = _docs(spark, [" ".join(rng.choices(words[:5], k=rng.randint(1, 20))) for _ in range(15)])
    raw = _docs(
        spark,
        ["", "   "] + [" ".join(rng.choices(words, k=rng.randint(0, 25))) for _ in range(40)],
        100,
    )
    a = sorted(map(tuple, dsir_topk(raw, target, k=12, n_buckets=64).collect()))
    b = sorted(
        map(
            tuple,
            dsir_topk(raw, target, k=12, n_buckets=64, strategy="fast").collect(),
        )
    )
    assert a == b


def test_fast_expr_parity_on_unicode_whitespace(spark):
    """r8 ADVICE (medium): Java regex \\s+ (the expr face's tokenize) does
    NOT split on Unicode whitespace, while python str.split() does.  The
    fast face must match the EXPR face on documents containing NBSP
    (\\u00a0), NEL (\\x85), \\u2028 and the \\x1c-\\x1f separators — these
    occur routinely in crawled web text."""
    target = _docs(
        spark,
        ["alpha beta gamma", "alpha beta", "delta\x85epsilon zeta"],
    )
    raw = _docs(
        spark,
        [
            "alpha beta gamma",          # NBSP-joined: ONE token to Java \s
            "alpha beta gamma",               # space-split twin: different feats
            "line sep and\x1cfs toks",
            "plain alpha beta",
            "nel\x85joined zeta",
        ],
        100,
    )
    a = sorted(map(tuple, dsir_topk(raw, target, k=5, n_buckets=64).collect()))
    b = sorted(
        map(
            tuple,
            dsir_topk(raw, target, k=5, n_buckets=64, strategy="fast").collect(),
        )
    )
    assert a == b
    # and the tokenizer semantics themselves: NBSP does not separate
    assert (
        hashed_ngram_features(_docs(spark, ["a b c"]), 16).count() == 3
    )  # tokens ["a b", "c"] -> 2 unigrams + 1 bigram


def test_py_tokenize_matches_jvm_tokenize_char_classes(spark):
    """Pin functions.text.py_tokenize == tokenize() over every whitespace
    codepoint class that distinguishes Java \\s from Unicode."""
    from semantic_vector_search_system_spark.functions.text import (
        py_tokenize,
        tokenize,
    )

    cases = [
        "a b\tc\nd\x0be\x0cf\rg",          # the six Java \s chars: all split
        "a b", "x\x85y", "p q",  # Unicode ws: NOT separators
        "m\x1cn\x1do\x1ep\x1fq",
        "  lead trail  ", "", "   ", "one",
    ]
    df = spark.createDataFrame([(t,) for t in cases], "text string")
    jvm = [r["t"] for r in df.select(tokenize("text").alias("t")).collect()]
    assert jvm == [py_tokenize(t) for t in cases]


def test_stored_model_batch_equivalence(spark):
    """Serving contract: scoring the training raw pool against the
    STORED ratio tables reproduces dsir_topk exactly, and a disjoint
    new batch scores through the same model without re-reading either
    training corpus."""
    import random

    from semantic_vector_search_system_spark.operators.dsir import (
        dsir_score_batch,
        write_dsir_model,
    )

    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rng = random.Random(21)
    target = _docs(spark, [" ".join(rng.choices(words[:4], k=rng.randint(2, 15))) for _ in range(12)])
    raw = _docs(spark, [" ".join(rng.choices(words, k=rng.randint(1, 18))) for _ in range(25)], 100)
    for t in ("dsirm_ratios", "dsirm_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        meta = write_dsir_model(raw, target, "dsirm", n_buckets=64)
        assert meta["n_buckets"] == 64
        a = sorted(map(tuple, dsir_topk(raw, target, k=10, n_buckets=64).collect()))
        b = sorted(map(tuple, dsir_score_batch(raw, "dsirm", k=10).collect()))
        assert a == b
        # the stored model is exactly n_buckets rows
        assert spark.read.table("dsirm_ratios").count() == 64
        # a new batch scores through the stored model (no training reads)
        batch = _docs(spark, ["alpha beta alpha", "zzz yyy"], 500)
        got = {r["doc_id"]: r["rank"] for r in
               dsir_score_batch(batch, "dsirm", k=2).collect()}
        assert got[500] == 1 and got[501] == 2  # target-vocab doc wins
    finally:
        for t in ("dsirm_ratios", "dsirm_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_streaming_dsir_gate_crawl_loop(spark, tmp_path):
    """Streaming DSIR e2e: two micro-batches of crawled docs score
    against the STORED model (fit once, never re-read) and carry the
    accept gate; target-vocab docs pass, alien-vocab docs fail."""
    from semantic_vector_search_system_spark.operators.dsir import (
        write_dsir_model,
    )
    from semantic_vector_search_system_spark.streaming.events import (
        streaming_dsir_score_foreach_batch,
    )

    prefix = "stream_dsir_model"
    for t in ("_ratios", "_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
    try:
        target = _docs(spark, ["good clean prose here"] * 6)
        raw = _docs(spark, ["good clean prose here", "spam junk buy now",
                            "clean prose", "junk spam"], 100)
        write_dsir_model(raw, target, prefix, n_buckets=64)

        in_dir = str(tmp_path / "crawl")
        b1 = _docs(spark, ["good clean prose", "buy now junk"], 500)
        b2 = _docs(spark, ["clean prose here", ""], 600)
        b1.coalesce(1).write.mode("append").parquet(in_dir)
        b2.coalesce(1).write.mode("append").parquet(in_dir)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_path = str(tmp_path / "scored")
        streaming_dsir_score_foreach_batch(
            spark, stream, prefix, out_path, accept_threshold=1.0
        )
        out = {r["doc_id"]: r for r in spark.read.parquet(out_path).collect()}
        assert set(out) == {500, 501, 600}  # empty doc emits nothing
        assert out[500]["accepted"] and out[600]["accepted"]
        assert not out[501]["accepted"]  # alien vocab scores below 1.0
        assert out[500]["dsir_score"] > out[501]["dsir_score"]
    finally:
        for t in ("_ratios", "_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
