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


def test_pack_sequences_greedy_semantics(spark):
    """Greedy per-shard packing: bins fill to the budget and reset; an
    over-budget doc gets a bin of its own; ordering is ascending id within
    shard; every doc appears exactly once."""
    from semantic_vector_search_system_spark.operators.corpus import pack_sequences

    # single shard (n_shards=1) makes the greedy walk directly checkable
    rows = [
        (0, "a " * 100),   # 100 tokens -> bin 0 (cum 100)
        (1, "b " * 100),   # cum 200 -> bin 0
        (2, "c " * 100),   # 300 > 256 -> bin 1 (cum 100)
        (3, "d " * 300),   # 400 > 256 -> bin 2 alone (over budget, kept whole)
        (4, "e " * 10),    # 310 > 256 -> bin 3
        (5, "f " * 246),   # 256 fits exactly -> bin 3
        (6, "g"),          # 257 > 256 -> bin 4
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["shard"], r["bin_in_shard"], r["n_tokens"])
        for r in pack_sequences(docs, budget=256, n_shards=1).collect()
    }
    assert got == {
        0: (0, 0, 100), 1: (0, 0, 100), 2: (0, 1, 100),
        3: (0, 2, 300), 4: (0, 3, 10), 5: (0, 3, 246), 6: (0, 4, 1),
    }


def test_pack_sequences_sharding_and_invariance(spark):
    """Sharded packing: shard = id % n_shards; results identical under
    arbitrary input repartitioning (per-shard sort pins the walk order);
    no bin exceeds the budget unless it holds a single over-budget doc."""
    from semantic_vector_search_system_spark.operators.corpus import pack_sequences

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.array_repeat(F.lit("tok"), (F.pmod(F.col("id") * 37, F.lit(90)) + 10).cast("int"))
        ).alias("text"),
    )
    base = {
        r["doc_id"]: (r["shard"], r["bin_in_shard"])
        for r in pack_sequences(docs, budget=128, n_shards=4).collect()
    }
    assert len(base) == 200
    assert all(s == d % 4 for d, (s, _) in base.items())
    scrambled = {
        r["doc_id"]: (r["shard"], r["bin_in_shard"])
        for r in pack_sequences(docs.repartition(13), budget=128, n_shards=4).collect()
    }
    assert scrambled == base
    # bin budget: aggregate token sums per bin
    sums = (
        pack_sequences(docs, budget=128, n_shards=4)
        .groupBy("shard", "bin_in_shard")
        .agg(F.sum("n_tokens").alias("s"), F.count("*").alias("n"))
        .collect()
    )
    for r in sums:
        assert r["s"] <= 128 or r["n"] == 1, (r["shard"], r["bin_in_shard"], r["s"], r["n"])


def test_pack_sequences_null_and_empty_text(spark):
    """r5 review finding: null/empty text rows are zero-token docs, not a
    NaN crash inside the greedy walk."""
    from semantic_vector_search_system_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(0, "three tokens here"), (1, None), (2, ""), (3, "more words")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["bin_in_shard"], r["n_tokens"])
        for r in pack_sequences(docs, budget=10, n_shards=1).collect()
    }
    assert got[1] == (0, 0) and got[2] == (0, 0)
    assert got[0][1] == 3 and got[3][1] == 2
    assert len(got) == 4


def test_context_windows_hand_computed(spark):
    """Window-count formula + slice contents on hand-checkable docs:
    exact cover, overlap, short-tail, whole-doc and empty cases."""
    import pytest as _pytest

    from semantic_vector_search_system_spark.operators.corpus import (
        context_windows,
    )

    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(10))),  # 10 toks
            (1, "a b c"),                               # fits one window
            (2, None),                                  # no rows
            (3, "   "),                                 # no rows
        ],
        "doc_id long, text string",
    )
    rows = {
        (r["doc_id"], r["win_id"]): (r["win_tokens"], r["window_text"])
        for r in context_windows(docs, window_tokens=4, stride=3).collect()
    }
    # doc 0: n=10, windows = ceil((10-4)/3)+1 = 3 -> starts 0,3,6
    assert rows[(0, 0)] == (4, "t0 t1 t2 t3")
    assert rows[(0, 1)] == (4, "t3 t4 t5 t6")
    assert rows[(0, 2)] == (4, "t6 t7 t8 t9")
    assert rows[(1, 0)] == (3, "a b c")
    assert {d for d, _ in rows} == {0, 1}
    # every token of doc 0 appears in some window (coverage contract)
    covered = set()
    for (d, w), (_, txt) in rows.items():
        if d == 0:
            covered.update(txt.split())
    assert covered == {f"t{i}" for i in range(10)}

    with _pytest.raises(ValueError):
        context_windows(docs, window_tokens=4, stride=5)
    with _pytest.raises(ValueError):
        context_windows(docs, window_tokens=4, stride=0)


def test_context_windows_narrow_plan_and_invariance(spark):
    """The 100 TB property: chunking is a pure narrow map — zero
    Exchange in the plan — and output is partitioning-invariant."""
    from semantic_vector_search_system_spark.operators.corpus import (
        context_windows,
    )

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j) % 13}" for j in range(50))) for i in range(40)],
        "doc_id long, text string",
    )
    df = context_windows(docs, window_tokens=8, stride=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan.split("== Initial Plan ==")[0], plan[:1500]
    a = sorted(map(tuple, df.collect()))
    b = sorted(
        map(
            tuple,
            context_windows(
                docs.repartition(13), window_tokens=8, stride=6
            ).collect(),
        )
    )
    assert a == b and len(a) == 40 * 8  # ceil((50-8)/6)+1 = 8 per doc


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _py_context_windows(docs, window, stride):
    out = {}
    for i, t in docs.items():
        toks = t.split() if t else []
        n = len(toks)
        if n == 0:
            continue
        nw = max(0, -(-(max(n - window, 0)) // stride)) + 1
        for w in range(nw):
            seg = toks[w * stride : w * stride + window]
            out[(i, w)] = (len(seg), " ".join(seg))
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    data=st.data(),
    window=st.integers(min_value=1, max_value=7),
)
def test_context_windows_matches_python_oracle(spark, data, window):
    stride = data.draw(st.integers(min_value=1, max_value=window))
    n_docs = data.draw(st.integers(min_value=1, max_value=8))
    docs = {}
    for i in range(n_docs):
        n_tok = data.draw(st.integers(min_value=0, max_value=20))
        docs[i] = " ".join(f"w{data.draw(st.integers(0, 5))}" for _ in range(n_tok))
    from semantic_vector_search_system_spark.operators.corpus import (
        context_windows,
    )

    df = spark.createDataFrame(list(docs.items()), "doc_id long, text string")
    got = {
        (r["doc_id"], r["win_id"]): (r["win_tokens"], r["window_text"])
        for r in context_windows(
            df, window_tokens=window, stride=stride
        ).collect()
    }
    want = _py_context_windows(docs, window, stride)
    assert got == want, (docs, window, stride)
    # coverage invariant: every token index of every doc is inside >= 1 window
    for i, t in docs.items():
        n = len(t.split())
        if n == 0:
            continue
        covered = set()
        for (d, w), (wt, _) in got.items():
            if d == i:
                covered.update(range(w * stride, w * stride + wt))
        assert covered == set(range(n)), (i, docs, window, stride)


def test_deterministic_shuffle_is_a_permutation_matching_python(spark):
    from semantic_vector_search_system_spark.functions.hashing import (
        stable_hash64_py,
    )
    from semantic_vector_search_system_spark.operators.corpus import (
        deterministic_shuffle,
    )

    ids = list(range(40))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long").repartition(7)
    out = deterministic_shuffle(docs, n_shards=4, seed="e1").collect()
    got = {r["doc_id"]: (r["shard"], r["pos"]) for r in out}
    # python oracle: shard + rank by (hash, id) within shard
    hs = {i: stable_hash64_py(f"e1:{i}") for i in ids}
    by_shard: dict[int, list[int]] = {}
    for i in ids:
        by_shard.setdefault(hs[i] % 4, []).append(i)
    want = {}
    for sh, members in by_shard.items():
        for pos, i in enumerate(sorted(members, key=lambda i: (hs[i], i)), 1):
            want[i] = (sh, pos)
    assert got == want
    # per-shard positions are 1..n contiguous
    for sh, members in by_shard.items():
        assert sorted(p for i, (s, p) in got.items() if s == sh) == list(
            range(1, len(members) + 1)
        )


def test_deterministic_shuffle_seed_and_partitioning(spark):
    from semantic_vector_search_system_spark.operators.corpus import (
        deterministic_shuffle,
    )

    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    base = sorted(
        tuple(r) for r in deterministic_shuffle(docs, 4, seed="a").collect()
    )
    again = sorted(
        tuple(r)
        for r in deterministic_shuffle(
            docs.repartition(13), 4, seed="a", num_partitions=3
        ).collect()
    )
    other = sorted(
        tuple(r) for r in deterministic_shuffle(docs, 4, seed="b").collect()
    )
    assert base == again          # same seed: identical under any layout
    assert base != other          # new seed: new epoch permutation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        deterministic_shuffle(docs, 0)


def test_temperature_mixture_upweights_low_resource(spark):
    """sqrt-temperature: a 100:1 token imbalance samples at 10:1, and
    weights sum to 1 (round-6)."""
    from semantic_vector_search_system_spark.operators.corpus import (
        temperature_mixture_weights,
    )

    rows = [(i, "tok " * 100, "big") for i in range(100)]          # 10000 tokens
    rows += [(1000 + i, "tok " * 10, "small") for i in range(10)]  # 100 tokens
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["lang"]: r for r in temperature_mixture_weights(docs).collect()}
    assert out["big"]["total_tokens"] == 10_000
    assert out["small"]["total_tokens"] == 100
    # raw share 100:1 -> temperature weight ratio sqrt(100)=10:1
    ratio = out["big"]["temp_weight"] / out["small"]["temp_weight"]
    assert abs(ratio - 10.0) < 1e-4  # round-6 weights quantize the ratio
    assert abs(out["big"]["temp_weight"] + out["small"]["temp_weight"] - 1.0) < 2e-6
    # low-resource upweighted vs raw share, high-resource downweighted
    assert out["small"]["temp_weight"] > out["small"]["raw_share"]
    assert out["big"]["temp_weight"] < out["big"]["raw_share"]
