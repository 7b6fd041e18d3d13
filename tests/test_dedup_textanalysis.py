"""Dedup + text-analysis operators on synthetic corpora with known dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators import dedup as dd
from semantic_vector_search_system_spark.operators import similarity as sim
from semantic_vector_search_system_spark.operators import textanalysis as ta


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox jumps over a lazy cat"),    # near dup of 1
        (4, "completely different text about spark engines here"),
        (5, "unrelated words nothing shared with others at all"),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_exact_dedup_finds_cluster(corpus):
    out = {r["canonical_id"]: r["n_copies"] for r in dd.exact_dedup(corpus).collect()}
    assert out[1] == 2  # docs 1 and 2 collapse
    assert sum(out.values()) == 5


def test_minhash_identical_docs_identical_signatures(corpus):
    sigs = dd.minhash_signatures(corpus, num_hashes=8).collect()
    by_doc = {}
    for r in sigs:
        by_doc.setdefault(r["doc_id"], {})[r["seed"]] = r["minhash"]
    assert by_doc[1] == by_doc[2]
    assert by_doc[1] != by_doc[4]
    assert len(by_doc[1]) == 8


def test_lsh_candidates_include_exact_dups(corpus):
    sigs = dd.minhash_signatures(corpus, num_hashes=8)
    pairs = {(r["id_a"], r["id_b"]) for r in dd.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs
    assert (4, 5) not in pairs


def test_jaccard_values(corpus):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(corpus, threshold=0.0).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.0 < out[(1, 3)] < 1.0
    assert (1, 4) not in out  # no shared 3-shingles


def test_simhash_near_dup_distance(corpus):
    sh = {r["doc_id"]: r["simhash"] for r in ta.simhash(corpus, bits=32).collect()}
    assert sh[1] == sh[2]

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(sh[1], sh[3]) < hamming(sh[1], sh[4])


def test_quality_and_token_stats(corpus):
    q = {r["doc_id"]: r for r in ta.doc_quality(corpus).collect()}
    assert q[1]["n_tokens"] == 9
    assert q[1]["stopword_ratio"] == pytest.approx(2 / 9, abs=1e-4)
    assert 0.0 <= q[1]["quality_score"] <= 1.0


def test_fingerprint_deterministic_and_dup_stable(corpus):
    fp1 = {r["doc_id"]: r["fingerprint"] for r in ta.doc_fingerprint(corpus).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in ta.doc_fingerprint(corpus).collect()}
    assert fp1 == fp2
    assert fp1[1] == fp1[2]


def test_cosine_self_join_threshold(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.01, 0.0]),  # near-dup of 1
        (3, [0.0, 1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             sim.cosine_self_join(emb, threshold=0.9).collect()}
    assert set(pairs) == {(1, 2)}
    assert pairs[(1, 2)] > 0.99


def test_lsh_bucket_candidates_find_near_dup(spark):
    rows = [
        (1, [1.0, 0.2, -0.3, 0.5]),
        (2, [1.0, 0.21, -0.29, 0.5]),  # near-dup of 1
        (3, [-1.0, 0.9, 0.4, -0.7]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    pairs = {(r["id_a"], r["id_b"]) for r in
             sim.lsh_bucket_candidates(emb, num_planes=8).collect()}
    assert (1, 2) in pairs


def test_cosine_neardup_bucketed_precision_and_recall(spark):
    """Every emitted pair must appear in the exact all-pairs result with the
    same rounded cosine (precision exact); true near-dups (cos>=0.99) must
    be recovered (banding recall ~1 at that similarity)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             sim.cosine_self_join(emb, threshold=0.45).collect()}
    lsh = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           sim.cosine_neardup_bucketed(emb, threshold=0.45, dim=64).collect()}
    assert set(lsh) <= set(exact)
    for pair, cos in lsh.items():
        assert abs(cos - exact[pair]) < 1e-9
    high = {p for p, c in exact.items() if c >= 0.99}
    assert high <= set(lsh)


def test_cosine_self_join_guard_raises_beyond_broadcast_bound(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)],
        "vec_id bigint, embedding array<float>",
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="cosine_neardup_bucketed"):
        sim.cosine_self_join(emb, max_broadcast_rows=5)


def test_ivf_topk_recall_vs_bruteforce(spark):
    """IVF with nprobe=2/8 centroids should recover most of the exact top-5."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.search import topk_bruteforce
    from semantic_vector_search_system_spark.operators.similarity import ivf_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    d = emb.select(F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"))
    exact = {(r["qid"], r["docid"]) for r in topk_bruteforce(q, d, k=5, metric="cosine").collect()}
    approx = {(r["qid"], r["docid"]) for r in ivf_topk(q, d, cents, k=5, nprobe=2).collect()}
    # self-match always recovered; overall recall is data-dependent but must
    # be well above the random ~nprobe/n_centroids floor
    assert len(exact & approx) / len(exact) > 0.3
    assert all((i, i) in approx for i in range(10))


def test_incremental_new_docs(spark, corpus):
    from semantic_vector_search_system_spark.operators.dedup import (
        exact_dedup,
        incremental_new_docs,
    )

    index = exact_dedup(corpus)
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog"),  # dup of doc 1
            (11, "a genuinely new document body"),
        ],
        "doc_id bigint, text string",
    )
    out = incremental_new_docs(new, index)
    assert [r["doc_id"] for r in out.collect()] == [11]


def test_asof_join_semantics(spark):
    from semantic_vector_search_system_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("k1", 10, "e1"), ("k1", 20, "e2"), ("k1", 5, "e0"), ("k2", 10, "e3")],
        "k string, t long, eid string",
    )
    right = spark.createDataFrame(
        [("k1", 7, 100), ("k1", 10, 200), ("k1", 15, 300), ("k3", 1, 400)],
        "k string, t long, fact long",
    )
    out = {
        r["eid"]: r["fact"]
        for r in asof_join(
            left, right, on="k", left_time="t", right_time="t",
            payload_cols=["fact"], right_tiebreak="fact",
        ).collect()
    }
    assert out["e0"] is None          # no fact at or before t=5
    assert out["e1"] == 200           # inclusive: fact at exactly t=10 visible
    assert out["e2"] == 300           # latest earlier fact
    assert out["e3"] is None          # key with no facts


def test_quantized_rerank_close_to_exact(spark):
    """Two-stage int8 retrieval must recover (almost all of) the exact top-5."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.quantize import (
        global_max_abs,
        quantized_topk_rerank,
    )
    from semantic_vector_search_system_spark.operators.search import topk_bruteforce

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    scale = global_max_abs(emb)
    assert scale > 0
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    d = emb.select(F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"))
    exact = {(r["qid"], r["docid"]) for r in topk_bruteforce(q, d, k=5, metric="cosine").collect()}
    two_stage = {(r["qid"], r["docid"]) for r in
                 quantized_topk_rerank(q, d, scale, k=5, candidates=20).collect()}
    assert len(exact & two_stage) / len(exact) >= 0.8


def test_asof_grouped_matches_window_form(spark):
    """Both as-of physical strategies agree on the driver events/orders data."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.asof import (
        asof_join,
        asof_join_grouped,
    )
    from semantic_vector_search_system_spark.functions import timeutil as tu
    from semantic_vector_search_system_spark.plans.catalog import T

    sf = "/root/testdata/sf0.001"
    ev = T(spark, sf, "events").filter(F.col("event_id") % 20 == 0).select(
        "event_id", "user_id", tu.epoch_us("ts").alias("t")
    )
    orders = T(spark, sf, "orders").select(
        F.col("o_custkey").alias("user_id"),
        tu.epoch_us("o_orderdate").alias("t"),
        "o_orderkey",
        "o_totalprice",
    )
    kw = dict(on="user_id", left_time="t", right_time="t",
              payload_cols=["o_orderkey", "o_totalprice"], right_tiebreak="o_orderkey")
    a = {(r["event_id"], r["o_orderkey"]) for r in asof_join(ev, orders, **kw).collect()}
    b = {(r["event_id"], r["o_orderkey"]) for r in asof_join_grouped(ev, orders, **kw).collect()}
    assert a == b and a


def test_deterministic_splits_stable_and_partitioned(spark):
    from semantic_vector_search_system_spark.functions.sampling import (
        deterministic_sample,
        split_assign,
    )
    import pyspark.sql.functions as F

    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    w = {"train": 8, "val": 1, "test": 1}
    a = {r["doc_id"]: r["split"] for r in
         df.withColumn("split", split_assign("doc_id", w, seed=7)).collect()}
    b = {r["doc_id"]: r["split"] for r in
         df.repartition(13).withColumn("split", split_assign("doc_id", w, seed=7)).collect()}
    assert a == b  # partitioning-invariant
    from collections import Counter

    c = Counter(a.values())
    assert 0.75 < c["train"] / 2000 < 0.85
    assert 0.05 < c["val"] / 2000 < 0.15
    # sample: subset property + reproducibility
    s1 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 10, seed=3).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 10, seed=3).collect()}
    assert s1 == s2 and 100 < len(s1) < 300


def test_lsh_bucket_edges_same_clusters_as_clique_pairs(spark):
    """Star edges per LSH bucket must yield EXACTLY the components the full
    candidate-pair clique yields — including chained buckets (doc in two
    buckets merging them transitively)."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.dedup import (
        lsh_bucket_edges,
        lsh_candidate_pairs,
        minhash_signatures,
        neardup_clusters,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = (
        # identical 6-copy cluster
        [(f"a{i}", base) for i in range(6)]
        # near-dup chain: b0~b1 share most shingles, b1~b2 likewise
        + [("b0", base + " extra one"), ("b1", base + " extra two"),
           ("b2", "beta gamma delta epsilon zeta eta theta iota kappa lamda")]
        # unique singletons
        + [("u0", "totally different words entirely here now then always"),
           ("u1", "other disjoint vocabulary with nothing shared at all ok")]
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string").repartition(5)
    sigs = minhash_signatures(docs).cache()

    def comp_sets(edge_df):
        cl = neardup_clusters(edge_df).collect()
        comps = {}
        for r in cl:
            comps.setdefault(r["cluster_id"], set()).add(r["doc_id"])
        return {frozenset(v) for v in comps.values()}

    clique = comp_sets(lsh_candidate_pairs(sigs))
    star = comp_sets(lsh_bucket_edges(sigs))
    assert star == clique
    # the identical 6-copy cluster ends up in ONE component (possibly merged
    # with the near-dup b-chain, depending on banding collisions)
    assert len({c for c in star if "a0" in c}) == 1
    a_comp = next(c for c in star if "a0" in c)
    assert {f"a{i}" for i in range(6)} <= a_comp
    # unique singletons never join anything (no edges -> absent from output)
    assert not any("u0" in c or "u1" in c for c in star)
    sigs.unpersist()


def test_aqe_skew_split_on_band_join(spark):
    """A skewed duplicate cluster makes one (band, band_sig) bucket hot; the
    candidate-pair band join must be split by AQE skew-join at runtime (the
    no-manual-salting 100 TB path for the dedup pipeline's only join)."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_fast,
    )

    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.shuffle.partitions": "8",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        idnum = F.col("id").cast("long")
        hot = "terms of service boilerplate repeated verbatim across mirrors"
        # md5 doc ids: incompressible shuffle payload, so the hot bucket's
        # byte size is visible to the size-based skew detector (short
        # sequential ids + identical band_sigs compress away)
        docs = spark.range(0, 900, 1, 8).select(
            F.md5(F.col("id").cast("string")).alias("doc_id"),
            F.when(idnum < 500, F.lit(hot))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.lit("unique document body number"),
                    F.col("id").cast("string"),
                    F.lit("with distinct trailing content words"),
                )
            )
            .alias("text"),
        )
        # one band (rows_per_band = num_hashes): a single hot bucket key, so
        # the hot partition towers over the median (with 4 bands the 4 hot
        # keys spread across partitions and lift the median instead)
        pairs = lsh_candidate_pairs(minhash_signatures_fast(docs), rows_per_band=8)
        # collect() executes THIS Dataset's QueryExecution (count() would
        # build a different plan and leave this one unfinalized)
        rows = pairs.collect()
        assert len(rows) >= 500 * 499 // 2  # the hot clique is present
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


# --- vectorized "fast" MinHash family (hash_family="fast") ---------------


def _sig_map(rows, id_key="doc_id"):
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r[id_key], {})[r["seed"]] = r["minhash"]
    return by_doc


def test_fast_family_shape_and_identical_docs(corpus):
    sigs = dd.minhash_signatures_fast(corpus, hash_family="fast", num_hashes=8)
    assert sigs.columns == ["doc_id", "seed", "minhash"]
    by_doc = _sig_map(sigs.collect())
    assert set(by_doc) == {1, 2, 3, 4, 5}
    for seeds in by_doc.values():
        assert set(seeds) == set(range(8))
        assert all(0 <= v < (1 << 60) for v in seeds.values())
    assert by_doc[1] == by_doc[2]          # exact dups: identical signatures
    assert by_doc[1] != by_doc[5]          # disjoint vocab: different


def test_fast_family_partitioning_and_batch_invariance(spark, corpus):
    """Signatures must not depend on partitioning or Arrow batch boundaries
    (windows never cross documents; token hashing depends on bytes only)."""
    base = _sig_map(dd.minhash_signatures_fast(
        corpus.repartition(1), hash_family="fast").collect())
    repart = _sig_map(dd.minhash_signatures_fast(
        corpus.repartition(7), hash_family="fast").collect())
    assert base == repart
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        tiny = _sig_map(dd.minhash_signatures_fast(
            corpus.repartition(1), hash_family="fast").collect())
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert base == tiny


def test_fast_family_whitespace_and_short_docs(spark):
    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha  beta   gamma\tdelta"),   # whitespace runs == single spaces
        (3, ""),                              # empty doc
        (4, "   "),                           # whitespace-only == empty
        (5, "solo"),                          # shorter than shingle_n
        (6, "solo"),                          # identical short doc
        (7, "solo extra"),                    # short doc, different content
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    by_doc = _sig_map(dd.minhash_signatures_fast(
        docs, hash_family="fast").collect())
    assert set(by_doc) == {1, 2, 3, 4, 5, 6, 7}
    assert by_doc[1] == by_doc[2]
    assert by_doc[3] == by_doc[4]
    assert by_doc[5] == by_doc[6]
    assert by_doc[5] != by_doc[7]
    assert by_doc[5] != by_doc[3]


def test_fast_family_unicode_whitespace_matches_java_class(spark):
    """r8 ADVICE class of bug: the fast family's tokenizers (pyarrow
    ascii_split_whitespace in the vectorized band kernel, py_tokenize in
    the per-row kernel) must treat ONLY the Java \\s chars as separators —
    NBSP/NEL/U+2028 join tokens, exactly like the md5/expr family's
    tokenize().  An NBSP-joined doc therefore differs from its space-split
    twin, and the two fast forms agree with each other."""
    rows = [
        (1, "alpha beta gamma delta"),   # NBSP: "alpha beta" is ONE token
        (2, "alpha beta gamma delta"),        # space twin: different shingles
        (3, "alpha beta gamma delta"),   # identical NBSP doc
        (4, "neljoin gamma delta"),
        (5, "ls join gamma delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    by_doc = _sig_map(dd.minhash_signatures_fast(
        docs, hash_family="fast").collect())
    assert by_doc[1] == by_doc[3]
    assert by_doc[1] != by_doc[2]
    assert by_doc[4] != by_doc[2] and by_doc[5] != by_doc[2]
    # vectorized fused band kernel sees the same tokens: identical docs
    # collide on every band, the NBSP doc and its space twin do not
    bands = dd.minhash_band_signatures_vectorized(
        docs, id_col="doc_id", text_col="text",
        num_hashes=8, rows_per_band=2,
    ).collect()
    sig_of = {}
    for r in bands:
        sig_of.setdefault(r["doc_id"], set()).add((r["band"], r["band_sig"]))
    assert sig_of[1] == sig_of[3]
    assert sig_of[1] != sig_of[2]


def test_fast_family_position_sensitive(spark):
    """Permuted token order must change the signature (the linear combine is
    position-weighted, not a bag-of-tokens sum)."""
    rows = [(1, "alpha beta gamma delta epsilon"),
            (2, "beta alpha gamma epsilon delta")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    by_doc = _sig_map(dd.minhash_signatures_fast(
        docs, hash_family="fast").collect())
    assert by_doc[1] != by_doc[2]


def test_fast_family_same_clusters_as_md5_family(spark):
    """On a corpus of exact-dup clusters + disjoint singletons both hash
    families must produce the same dedup components (near-dup boundary cases
    may legitimately differ — different hash family, same MinHash math)."""
    rows = (
        [(f"a{i}", "alpha beta gamma delta epsilon zeta eta theta") for i in range(5)]
        + [(f"b{i}", "one two three four five six seven eight nine") for i in range(3)]
        + [("u0", "totally different words entirely here now then always"),
           ("u1", "other disjoint vocabulary with nothing shared at all")]
    )
    docs = spark.createDataFrame(rows, "doc_id string, text string").repartition(4)

    def comps(family):
        sigs = dd.minhash_signatures_fast(docs, hash_family=family)
        cl = dd.neardup_clusters(dd.lsh_bucket_edges(sigs)).collect()
        out = {}
        for r in cl:
            out.setdefault(r["cluster_id"], set()).add(r["doc_id"])
        return {frozenset(v) for v in out.values()}

    expected = {frozenset(f"a{i}" for i in range(5)),
                frozenset(f"b{i}" for i in range(3))}
    assert comps("fast") == expected
    assert comps("md5") == expected


def test_fast_family_rejects_unknown_family(corpus):
    with pytest.raises(ValueError, match="hash_family"):
        dd.minhash_signatures_fast(corpus, hash_family="sha9000")


# --- verify_candidate_edges (the candidates -> verify -> cluster stage) --


def test_verify_edges_matches_ngram_jaccard(spark, corpus):
    """Per-edge verification must agree with the all-pairs oracle on the
    same pairs."""
    oracle = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.ngram_jaccard_pairs(corpus, threshold=0.0).collect()
    }
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a bigint, id_b bigint"
    )
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dd.verify_candidate_edges(
            corpus, edges, threshold=0.0
        ).collect()
    }
    assert out[(1, 2)] == oracle[(1, 2)] == 1.0
    assert out[(1, 3)] == oracle[(1, 3)]
    # (1, 4) shares no shingle: jaccard 0.0 survives threshold=0.0's >=,
    # but is killed by any positive threshold
    assert out[(1, 4)] == 0.0


def test_verify_edges_threshold_kills_false_positives(spark, corpus):
    """A spurious LSH edge between unrelated docs must not survive."""
    edges = spark.createDataFrame(
        [(1, 2), (4, 5)], "id_a bigint, id_b bigint"
    )
    out = dd.verify_candidate_edges(corpus, edges, threshold=0.7).collect()
    assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}


def test_verify_edges_star_bucket_splits_cluster(spark):
    """Star edges from one LSH bucket: the center is similar to some
    members but not others — verification keeps only the true dups, so
    clustering splits the bucket instead of merging it whole."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),
        (2, "alpha beta gamma delta epsilon zeta"),   # true dup of 1
        (3, "alpha beta gamma delta epsilon eta"),    # near dup of 1
        (4, "one two three four five six seven"),     # false bucket-mate
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4)], "id_a bigint, id_b bigint"
    )
    kept = dd.verify_candidate_edges(docs, edges, threshold=0.5)
    clusters = {
        r["doc_id"]: r["cluster_id"] for r in dd.neardup_clusters(kept).collect()
    }
    assert clusters[1] == clusters[2] == clusters[3] == 1
    assert 4 not in clusters  # its only edge died in verification


def test_verify_edges_arrow_kernel_matches_expr(spark, corpus):
    """The mapInPandas shingle-hash kernel and the declarative HOF form
    must produce identical jaccard values on the same edges."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (4, 5)], "id_a bigint, id_b bigint"
    )
    by_kernel = {}
    for kernel in ("expr", "arrow"):
        by_kernel[kernel] = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in dd.verify_candidate_edges(
                corpus, edges, threshold=0.0, kernel=kernel
            ).collect()
        }
    assert by_kernel["expr"] == by_kernel["arrow"]
    with pytest.raises(ValueError, match="unknown kernel"):
        dd.verify_candidate_edges(corpus, edges, kernel="simd").collect()


def test_fused_band_signatures_match_two_step_form(spark, corpus):
    """minhash_band_signatures_fast must equal
    band_signatures(minhash_signatures_fast(...)) value-for-value, and the
    derived candidate pairs must match lsh_candidate_pairs — across
    partitionings (the fused kernel is a narrow map, so the output cannot
    depend on batch boundaries)."""
    two_step = {
        (r["doc_id"], r["band"]): r["band_sig"]
        for r in dd.band_signatures(
            dd.minhash_signatures_fast(corpus, num_hashes=8, shingle_n=3),
            rows_per_band=2,
        ).collect()
    }
    for docs in (corpus, corpus.repartition(7)):
        fused = {
            (r["doc_id"], r["band"]): r["band_sig"]
            for r in dd.minhash_band_signatures_fast(
                docs, num_hashes=8, shingle_n=3, rows_per_band=2
            ).collect()
        }
        assert fused == two_step
    bands = dd.minhash_band_signatures_fast(
        corpus, num_hashes=8, shingle_n=3, rows_per_band=2
    )
    from_bands = {
        (r["id_a"], r["id_b"])
        for r in dd.lsh_candidate_pairs_from_bands(bands).collect()
    }
    classic = {
        (r["id_a"], r["id_b"])
        for r in dd.lsh_candidate_pairs(
            dd.minhash_signatures_fast(corpus, num_hashes=8, shingle_n=3),
            rows_per_band=2,
        ).collect()
    }
    assert from_bands == classic and (1, 2) in from_bands


def test_connected_components_driver_and_iterative_agree(spark):
    """The small-graph driver union-find and the distributed min-label
    propagation must produce identical (node, component) labelings —
    including chain, star, singleton-pair and cross-partition shapes."""
    import random

    from semantic_vector_search_system_spark.operators.dedup import (
        connected_components,
    )

    rng = random.Random(7)
    edges = []
    # chain 0-1-2-...-9 (worst diameter for propagation)
    edges += [(i, i + 1) for i in range(9)]
    # star hub 100
    edges += [(100, 100 + i) for i in range(1, 8)]
    # random pairs in a disjoint id range
    edges += [(1000 + rng.randrange(50), 1000 + rng.randrange(50)) for _ in range(30)]
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "id_a long, id_b long"
    ).repartition(7)
    fast = {
        (r.node, r.component)
        for r in connected_components(pairs).collect()
    }
    slow = {
        (r.node, r.component)
        for r in connected_components(pairs, small_edge_threshold=0).collect()
    }
    assert fast == slow
    # labels are component minima
    comps = {}
    for n, c in fast:
        comps.setdefault(c, []).append(n)
    assert all(min(v) == c for c, v in comps.items())


def test_ivf_topk_fast_matches_hof_form(spark):
    """The BLAS cogroup IVF (ivf_topk_fast) must return the same ranked
    lists as the declarative HOF form on identical centroids/nprobe — same
    logical plan, different physical strategy (r4 scale path)."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_fast,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    d = emb.select(F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"))
    hof = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in ivf_topk(q, d, cents, k=5, nprobe=2).collect()
    }
    blas = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in ivf_topk_fast(q, d, cents, k=5, nprobe=2).collect()
    }
    assert hof == blas


def test_ivf_search_partitioned_prunes_and_matches(spark, tmp_path):
    """IVF serving against a cent_id-partitioned parquet index: results
    equal the declarative ivf_topk (same lists probed, exact cosine within
    them) and the scan's partition filters prune to the probed lists."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_search_partitioned,
        ivf_topk,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        write_vector_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    d = emb.select(F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"))
    dl = ivf_assign_fast(d, cents, id_col="docid", vec_col="vec", nprobe=1).select(
        "docid", "cent_id"
    )
    idx = str(tmp_path / "ivf_index")
    write_vector_index(d.join(dl, "docid"), idx, partition_by="cent_id")

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    served = ivf_search_partitioned(spark, idx, cents, q, k=5, nprobe=2)
    expected = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in ivf_topk(q, d, cents, k=5, nprobe=2).collect()
    }
    got = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in served.collect()
    }
    assert got == expected
    # the scan must carry partition filters on cent_id (pruning, not a
    # post-scan filter over every file)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [cent_id" in plan.replace("#", " ").replace(
        "cent_id ", "cent_id"
    ) or "cent_id IN" in plan


def test_ivf_search_partitioned_per_query_lists(spark, tmp_path):
    """A query must NOT retrieve docs from lists it never probed (r4 ADVICE:
    the pre-r5 implementation ranked each query over the UNION of all
    queries' probed lists, so this engineered case diverged from ivf_topk).

    qa probes only list c0 (nprobe=1) but doc db — which lives in list c1,
    probed only by qb — has cosine ~0.70 to qa; union semantics would emit
    (qa, db) at rank 2, per-query semantics must emit exactly one row for
    qa."""
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_search_partitioned,
        ivf_topk,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        write_vector_index,
    )

    cents = spark.createDataFrame(
        [("c0", [1.0, 0.0]), ("c1", [0.0, 1.0])], "cent_id string, cvec array<double>"
    )
    d = spark.createDataFrame(
        [("da", [1.0, 0.1]), ("db", [0.8, 0.9]), ("dc", [0.1, 1.0])],
        "docid string, vec array<double>",
    )
    q = spark.createDataFrame(
        [("qa", [1.0, 0.05]), ("qb", [0.1, 1.0])], "qid string, qvec array<double>"
    )
    dl = ivf_assign_fast(d, cents, id_col="docid", vec_col="vec", nprobe=1).select(
        "docid", "cent_id"
    )
    assert {(r["docid"], r["cent_id"]) for r in dl.collect()} == {
        ("da", "c0"), ("db", "c1"), ("dc", "c1")
    }
    idx = str(tmp_path / "ivf_perq")
    write_vector_index(d.join(dl, "docid"), idx, partition_by="cent_id")

    rows = ivf_search_partitioned(spark, idx, cents, q, k=2, nprobe=1).collect()
    got = {(r["qid"], r["docid"]) for r in rows}
    assert got == {("qa", "da"), ("qb", "dc"), ("qb", "db")}
    # and exact parity with the declarative form on the same inputs
    expected = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in ivf_topk(q, d, cents, k=2, nprobe=1).collect()
    }
    served = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6)) for r in rows
    }
    assert served == expected


def test_ivf_fast_empty_edges(spark, tmp_path):
    """Empty-input behavior of the r4 IVF strategies is pinned: empty
    centroids raise by name; empty queries serve an empty typed result
    (reading zero partitions of the index)."""
    import pyspark.sql.functions as F
    import pytest as _pytest
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_search_partitioned,
        ivf_topk_fast,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        write_vector_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    d = emb.select(F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"))
    cents = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    no_cents = cents.filter(F.lit(False))
    with _pytest.raises(ValueError, match="centroids relation is empty"):
        ivf_assign_fast(d, no_cents, id_col="docid", vec_col="vec")

    no_q = emb.filter(F.lit(False)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    assert ivf_topk_fast(no_q, d, cents, k=3, nprobe=2).count() == 0

    dl = ivf_assign_fast(d, cents, id_col="docid", vec_col="vec", nprobe=1).select(
        "docid", "cent_id"
    )
    idx = str(tmp_path / "ivf_empty_q")
    write_vector_index(d.join(dl, "docid"), idx, partition_by="cent_id")
    served = ivf_search_partitioned(spark, idx, cents, no_q, k=3, nprobe=2)
    assert served.count() == 0
    assert [f.name for f in served.schema.fields] == ["qid", "docid", "rank", "score"]


def test_ivf_fast_parity_fuzz_shapes(spark, tmp_path):
    """Randomized-shape parity: the BLAS cogroup IVF AND the
    partition-pruned serving path equal the HOF form across dim /
    list-count / nprobe combinations (seeded numpy vectors, well-spread so
    near-exact centroid ties don't flip assignments).  Multi-query cases
    make this the structural guard for the r5 per-query-lists fix — under
    the old union-of-lists serving semantics these shapes diverge."""
    import numpy as np
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_search_partitioned,
        ivf_topk,
        ivf_topk_fast,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        write_vector_index,
    )

    rng = np.random.default_rng(7)
    for dim, n_docs, n_cents, nprobe, k in [
        (8, 120, 4, 1, 3),
        (16, 200, 6, 3, 5),
        (32, 150, 8, 8, 4),  # nprobe == n_lists: candidates = full corpus
    ]:
        M = rng.standard_normal((n_docs, dim)).round(3)  # coarse grid: no ties
        d = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(n_docs)],
            "docid bigint, vec array<double>",
        )
        cents = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(n_cents)],
            "cent_id bigint, cvec array<double>",
        )
        q = spark.createDataFrame(
            [(i, [float(x) for x in M[i]]) for i in range(0, n_docs, 17)],
            "qid bigint, qvec array<double>",
        )
        hof = {
            (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
            for r in ivf_topk(q, d, cents, k=k, nprobe=nprobe).collect()
        }
        blas = {
            (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
            for r in ivf_topk_fast(q, d, cents, k=k, nprobe=nprobe).collect()
        }
        assert hof == blas, (dim, n_cents, nprobe)

        dl = ivf_assign_fast(
            d, cents, id_col="docid", vec_col="vec", nprobe=1
        ).select("docid", "cent_id")
        idx = str(tmp_path / f"ivf_fuzz_{dim}_{n_cents}_{nprobe}")
        write_vector_index(d.join(dl, "docid"), idx, partition_by="cent_id")
        for strat, merge, pre_q in (
            ("broadcast", "window", False),
            ("broadcast", "driver", False),  # r6: the <=2-job serving merge
            ("broadcast", "driver", True),   # r6: in-memory-query, 1-job
            ("cogroup", "window", False),
        ):
            kwargs = (
                {"precollected_queries": [(r["qid"], r["qvec"]) for r in q.collect()]}
                if pre_q
                else {}
            )
            served = {
                (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
                for r in ivf_search_partitioned(
                    spark, idx, cents, q, k=k, nprobe=nprobe, strategy=strat,
                    merge=merge, **kwargs,
                ).collect()
            }
            assert served == hof, (dim, n_cents, nprobe, strat, merge, pre_q)


def test_star_candidates_hot_bucket_linear_not_quadratic(spark):
    """r5 VERDICT #3: a planted 5k-copy boilerplate bucket must cost O(b)
    candidate edges under the star form (b-1 member->representative edges)
    instead of the clique's C(b,2) ~ 12.5M pairs — and the keep-one
    clustering over verified star edges must equal the clique pipeline's
    output on this corpus (exact copies: similarity holds transitively
    through the representative)."""
    from pyspark.sql import functions as F

    b = 5_000
    hot = "terms of service boilerplate repeated verbatim across mirror sites"
    docs = (
        spark.range(0, b + 500, 1, 16)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < b, F.lit(hot))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.lit("unique article body number"),
                    F.col("id").cast("string"),
                    (F.col("id") * 7).cast("string"),
                    (F.col("id") * 13).cast("string"),
                )
            )
            .alias("text"),
        )
    )
    bands = dd.minhash_band_signatures_fast(
        docs, id_col="doc_id", num_hashes=8, shingle_n=3, rows_per_band=2
    ).localCheckpoint()
    star = dd.lsh_bucket_edges_from_bands(bands).localCheckpoint()
    n_star = star.count()
    # identical copies give identical band_sigs in every band, same rep ->
    # exactly b-1 distinct edges for the hot bucket (plus any incidental
    # collisions among the unique docs — near zero at this vocabulary)
    assert b - 1 <= n_star < 2 * b, n_star
    ver_star = dd.verify_candidate_edges(
        docs, star, id_col="doc_id", threshold=0.6
    ).select("id_a", "id_b")
    got = {
        (r["doc_id"], r["cluster_id"], r["n_members"], r["is_canonical"])
        for r in dd.neardup_clusters(ver_star).collect()
    }
    # clique form on the same corpus (restricted to the unique tail plus a
    # small slice of the hot bucket to keep the clique tractable) is not
    # needed for parity here: exact copies make the expected clustering
    # closed-form — ONE cluster of the b hot docs, rep 0 canonical.
    expected = {(i, 0, b, i == 0) for i in range(b)}
    assert got == expected


def test_ivf_recall_floor_at_bench_geometry(spark):
    """ANN accuracy is a pinned number, not just oracle parity (r5 VERDICT
    #2): at the bench key's index geometry — HashingEncoderFast dim=512,
    64 lists seeded from the first 64 doc vectors, seeded corpus — IVF
    recall@10 vs the exact brute-force answer must clear stated floors and
    rise monotonically with nprobe.  Measured at this config (20k docs,
    deterministic): 0.16 / 0.335 / 0.545 / 0.715 for nprobe 1/2/4/8; the
    floors leave margin for BLAS summation-order rank flips only."""
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.datagen import (
        generate_documents,
        generate_queries_and_qrels,
    )
    from semantic_vector_search_system_spark.operators.encode import (
        HashingEncoderFast,
    )
    from semantic_vector_search_system_spark.operators.search import (
        topk_bruteforce,
    )
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_topk_fast,
    )

    enc = HashingEncoderFast(dim=512)
    docs = generate_documents(spark, 20_000, seed=42, num_partitions=8).cache()
    dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec").cache()
    queries, _ = generate_queries_and_qrels(docs, 20, seed=42)
    qvec = (
        enc.encode(queries, text_col="query")
        .select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
        .cache()
    )
    cents = dvec.filter(F.substring("docid", 2, 18).cast("long") < 64).select(
        F.col("docid").alias("cent_id"), F.col("vec").alias("cvec")
    )
    dl = (
        ivf_assign_fast(dvec, cents, id_col="docid", vec_col="vec", nprobe=1)
        .select("docid", "cent_id")
        .cache()
    )
    k = 10
    exact: dict = {}
    for r in topk_bruteforce(qvec, dvec, k=k).collect():
        exact.setdefault(r["qid"], set()).add(r["docid"])
    recalls = {}
    for nprobe in (1, 2, 4, 8):
        approx: dict = {}
        for r in ivf_topk_fast(
            qvec, dvec, cents, k=k, nprobe=nprobe, doc_lists=dl
        ).collect():
            approx.setdefault(r["qid"], set()).add(r["docid"])
        recs = [len(exact[q] & approx.get(q, set())) / k for q in exact]
        recalls[nprobe] = sum(recs) / len(recs)
    assert recalls[1] >= 0.08 and recalls[2] >= 0.2
    assert recalls[4] >= 0.45 and recalls[8] >= 0.6, recalls
    assert recalls[1] < recalls[2] < recalls[4] < recalls[8], recalls
    # trained k-means centroids (train_ivf_centroids) must beat the
    # first-64-rows default where assignment precision matters most
    # (nprobe=1): measured 0.235 vs 0.16 at this geometry; margin covers
    # treeAggregate summation-order jitter across partitionings
    from semantic_vector_search_system_spark.operators.similarity import (
        train_ivf_centroids,
    )

    kcents = train_ivf_centroids(dvec, 64, vec_col="vec")
    kdl = (
        ivf_assign_fast(dvec, kcents, id_col="docid", vec_col="vec", nprobe=1)
        .select("docid", "cent_id")
        .cache()
    )
    kapprox: dict = {}
    for r in ivf_topk_fast(
        qvec, dvec, kcents, k=k, nprobe=1, doc_lists=kdl
    ).collect():
        kapprox.setdefault(r["qid"], set()).add(r["docid"])
    krec = sum(
        len(exact[q] & kapprox.get(q, set())) / k for q in exact
    ) / len(exact)
    for d in (docs, dvec, qvec, dl, kdl):
        d.unpersist()
    assert krec >= 0.2 and krec >= recalls[1] + 0.03, (krec, recalls[1])


def test_effective_nprobe_rule_and_selectivity_estimate(spark):
    """The selectivity-aware probe-widening rule (r9 VERDICT #5): nprobe
    scales by 1/selectivity (ceil), never shrinks, caps at max_nprobe,
    validates the range; estimate_selectivity measures a predicate on a
    seeded sample and never returns 0."""
    import pytest

    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.operators.similarity import (
        effective_nprobe,
        estimate_selectivity,
    )

    assert effective_nprobe(2, None) == 2
    assert effective_nprobe(2, 0.1) == 20
    assert effective_nprobe(4, 0.3) == 14  # ceil(4/0.3)
    assert effective_nprobe(2, 1.0) == 2
    assert effective_nprobe(2, 0.9) == 3  # widen, never round down to base-1
    assert effective_nprobe(2, 0.001, max_nprobe=64) == 64  # capped
    for bad in (0.0, -0.5, 1.5):
        with pytest.raises(ValueError):
            effective_nprobe(2, bad)
    df = spark.range(0, 10_000).select(F.col("id"))
    s = estimate_selectivity(df, F.col("id") % 10 == 3, sample_frac=0.2)
    assert 0.05 <= s <= 0.2, s
    # a never-matching predicate reports the smallest resolvable
    # selectivity, not zero (effective_nprobe then hits the cap)
    s0 = estimate_selectivity(df, F.lit(False), sample_frac=0.2)
    assert 0 < s0 <= 0.01


def test_filtered_ivf_auto_nprobe_restores_budget_parity(spark):
    """r9 VERDICT #5's done-criterion: with selectivity passed, the
    filtered probe auto-widens (2 -> 20 at sel 0.1) and filtered recall
    meets or beats the UNFILTERED recall at the same base nprobe — the
    equal scored-vector budget parity (widened probes score
    ~eff*sel*N/n_lists ~= base*N/n_lists vectors).  Measured at this
    geometry: unfiltered@2 0.335, filtered fixed@2 0.185 (the r9 gap),
    filtered auto 0.885."""
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.datagen import (
        generate_documents,
        generate_queries_and_qrels,
    )
    from semantic_vector_search_system_spark.operators.encode import (
        HashingEncoderFast,
    )
    from semantic_vector_search_system_spark.operators.search import (
        topk_bruteforce,
    )
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_topk_fast,
    )

    enc = HashingEncoderFast(dim=512)
    docs = generate_documents(spark, 20_000, seed=42, num_partitions=8).cache()
    dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec").cache()
    queries, _ = generate_queries_and_qrels(docs, 20, seed=42)
    qvec = (
        enc.encode(queries, text_col="query")
        .select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
        .cache()
    )
    cents = dvec.filter(F.substring("docid", 2, 18).cast("long") < 64).select(
        F.col("docid").alias("cent_id"), F.col("vec").alias("cvec")
    )
    pred = F.substring(F.col("docid"), -1, 1) == "3"  # selectivity ~0.1
    k = 10

    def recall(approx_df, exact):
        approx: dict = {}
        for r in approx_df.collect():
            approx.setdefault(r["qid"], set()).add(r["docid"])
        recs = [len(exact[q] & approx.get(q, set())) / k for q in exact]
        return sum(recs) / len(recs)

    exact_unf: dict = {}
    for r in topk_bruteforce(qvec, dvec, k=k).collect():
        exact_unf.setdefault(r["qid"], set()).add(r["docid"])
    exact_f: dict = {}
    for r in topk_bruteforce(qvec, dvec.filter(pred), k=k).collect():
        exact_f.setdefault(r["qid"], set()).add(r["docid"])

    r_unf = recall(ivf_topk_fast(qvec, dvec, cents, k=k, nprobe=2), exact_unf)
    # selectivity=1.0 pins the OLD fixed-probe behavior (no widening) —
    # since r11 a bare predicate auto-estimates selectivity instead
    r_fixed = recall(
        ivf_topk_fast(
            qvec, dvec, cents, k=k, nprobe=2, predicate=pred,
            selectivity=1.0,
        ),
        exact_f,
    )
    r_auto = recall(
        ivf_topk_fast(
            qvec, dvec, cents, k=k, nprobe=2, predicate=pred,
            selectivity=0.1, max_nprobe=64,
        ),
        exact_f,
    )
    # r10 VERDICT #7: the AUTO path is now the DEFAULT — a predicate with
    # no selectivity= estimates it from a deterministic content-hash
    # sample and widens the probe; the resolved count is recorded on the
    # result as .eff_nprobe
    auto_df = ivf_topk_fast(
        qvec, dvec, cents, k=k, nprobe=2, predicate=pred, max_nprobe=64
    )
    assert getattr(auto_df, "eff_nprobe", None) is not None
    assert auto_df.eff_nprobe > 2, auto_df.eff_nprobe  # it widened
    r_auto_default = recall(auto_df, exact_f)
    for d in (docs, dvec, qvec):
        d.unpersist()
    assert r_fixed < r_unf, (r_fixed, r_unf)  # the gap the rule closes
    assert r_auto >= r_unf, (r_auto, r_unf)   # equal-budget parity met
    assert r_auto >= r_fixed + 0.3, (r_auto, r_fixed)
    assert r_auto_default >= r_unf, (r_auto_default, r_unf)


def test_incremental_neardup_planted(spark):
    """Incremental near-dup against STORED corpus signatures only: an
    exact copy matches at est_jaccard 1.0, a near-copy (one token changed)
    matches above threshold, an unrelated doc stays is_dup=false — and the
    operator never sees the corpus text, only its signature rows."""
    from semantic_vector_search_system_spark.operators.dedup import (
        incremental_neardup,
        minhash_signatures_fast,
    )

    base = (
        "the quick brown fox jumps over the lazy dog while the patient "
        "crawler fetches mirrored pages from the syndicated archive nightly"
    )
    corpus = spark.createDataFrame(
        [
            (1, base),
            (2, "completely different corpus content about spark shuffles"),
            (3, "a third unrelated document mentioning parquet row groups"),
        ],
        "doc_id long, text string",
    )
    corpus_sigs = minhash_signatures_fast(corpus, num_hashes=8, shingle_n=3)
    new = spark.createDataFrame(
        [
            (10, base),                     # exact copy
            (11, base + " postscript"),     # near copy: shingle J = 18/19
            (12, "totally novel text with no overlap whatsoever in shingles"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["is_dup"], r["matched_id"], r["est_jaccard"])
        for r in incremental_neardup(new, corpus_sigs, threshold=0.5).collect()
    }
    assert set(got) == {10, 11, 12}           # every new doc gets a row
    assert got[10] == (True, 1, 1.0)          # exact copy: all 8 minima agree
    assert got[12] == (False, None, None)     # unrelated: no candidate at all
    is_dup, matched, est = got[11]
    # near-copy: deterministic under the fixed md5 family; one appended
    # token leaves >=7 of 8 minima intact for this text
    assert is_dup and matched == 1 and 0.5 <= est <= 1.0


def test_incremental_neardup_property_vs_python_oracle(spark):
    """Randomized equivalence: incremental_neardup equals a from-scratch
    python reimplementation of the whole chain (md5 KM minhash -> 2-row
    banding -> signature-agreement estimate -> threshold -> argmax with
    (est desc, id asc) tie-break) on adversarial corpora — shared shingles,
    exact copies both directions, docs shorter than the shingle width."""
    import hashlib
    import itertools
    import random

    from semantic_vector_search_system_spark.operators.dedup import (
        incremental_neardup,
        minhash_signatures_fast,
    )

    MOD = 1 << 60

    def py_sig(text, num_hashes=8):
        toks = text.split()
        n_sh = max(len(toks) - 2, 1)
        shingles = {" ".join(toks[i : i + 3]) for i in range(n_sh)}
        sig = []
        for s in range(num_hashes):
            best = None
            for sh in shingles:
                d = hashlib.md5(sh.encode()).hexdigest()
                h1, h2 = int(d[:15], 16), int(d[15:25], 16)
                v = (h1 + s * h2) % MOD
                best = v if best is None else min(best, v)
            sig.append(best)
        return tuple(sig)

    def py_oracle(new_rows, corpus_rows, threshold=0.5):
        nsig = {i: py_sig(t) for i, t in new_rows}
        csig = {i: py_sig(t) for i, t in corpus_rows}
        out = {}
        for ni, ns in nsig.items():
            cands = [
                ci
                for ci, cs in csig.items()
                if any(
                    ns[2 * b : 2 * b + 2] == cs[2 * b : 2 * b + 2]
                    for b in range(4)
                )
            ]
            best = None
            for ci in cands:
                est = sum(a == b for a, b in zip(ns, csig[ci])) / 8.0
                if est >= threshold and (
                    best is None or (est, -ci) > (best[1], -best[0])
                ):
                    best = (ci, est)
            out[ni] = (
                (True, best[0], best[1]) if best else (False, None, None)
            )
        return out

    rng = random.Random(11)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]
    for trial in range(4):
        corpus_rows = [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(6)
        ]
        new_rows = [
            (100 + i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
            for i in range(4)
        ]
        # plant one exact cross-copy so is_dup=True rows always exist
        new_rows.append((200, corpus_rows[trial % len(corpus_rows)][1]))

        corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
        new = spark.createDataFrame(new_rows, "doc_id long, text string")
        sigs = minhash_signatures_fast(corpus, num_hashes=8, shingle_n=3)
        got = {
            r["doc_id"]: (r["is_dup"], r["matched_id"], r["est_jaccard"])
            for r in incremental_neardup(new, sigs, threshold=0.5).collect()
        }
        assert got == py_oracle(new_rows, corpus_rows), f"trial {trial}"


def test_fused_vectorized_banding_same_collisions_as_two_step(spark):
    """The r5 fused fast-family banding kernel must produce the SAME bucket
    structure (hence identical star edges and clusters) as the two-step
    vectorized-signatures -> band_signatures path — the digests differ
    (arithmetic vs md5-of-concat) but collisions must not."""
    from semantic_vector_search_system_spark.operators.dedup import (
        band_signatures,
        lsh_bucket_edges_from_bands,
        minhash_band_signatures_vectorized,
        minhash_signatures_vectorized,
    )

    rows = []
    for i in range(60):
        if i < 10:
            rows.append((i, "identical boilerplate text repeated across mirror sites"))
        elif i < 20:
            g = i // 2
            rows.append((i, f"pair_{g} duplicated article body shared by partner {g}"))
        elif i == 20:
            rows.append((i, ""))          # zero-token doc
        elif i == 21:
            rows.append((i, "short"))     # sub-shingle-width doc
        else:
            rows.append((i, f"unique document number {i} with its own words {i * 7}"))
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)

    fused = minhash_band_signatures_vectorized(
        docs, num_hashes=16, rows_per_band=4
    )
    twostep = band_signatures(
        minhash_signatures_vectorized(docs, num_hashes=16), rows_per_band=4
    )

    def buckets(df):
        # partition structure: for each (band, band_sig) the frozenset of ids
        from collections import defaultdict

        m = defaultdict(set)
        for r in df.collect():
            m[(r["band"], r["band_sig"])].add(r["doc_id"])
        return sorted(
            (tuple(sorted(v)) for v in m.values() if len(v) > 1),
        )

    assert buckets(fused) == buckets(twostep)

    e_fused = {(r["id_a"], r["id_b"]) for r in lsh_bucket_edges_from_bands(fused).collect()}
    e_two = {(r["id_a"], r["id_b"]) for r in lsh_bucket_edges_from_bands(twostep).collect()}
    assert e_fused == e_two
    # the planted 10-copy cluster must be fully edged (star: 9 edges)
    assert {(0, b) for b in range(1, 10)} <= e_fused


def test_incremental_neardup_stored_bands_fast_family(spark):
    """The stored-index serving shape: corpus signatures AND band digests
    prebuilt with the fast-family kernels, per-batch cost only touches the
    new docs — exact copies still match at est 1.0, novel docs pass."""
    from semantic_vector_search_system_spark.operators.dedup import (
        incremental_neardup,
        minhash_band_signatures_vectorized,
        minhash_signatures_vectorized,
    )

    texts = {
        i: f"corpus document {i} body words {' '.join(str(i * j) for j in range(1, 9))}"
        for i in range(50)
    }
    corpus = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    sigs = minhash_signatures_vectorized(corpus, num_hashes=16)
    bands = minhash_band_signatures_vectorized(corpus, num_hashes=16, rows_per_band=4)
    new = spark.createDataFrame(
        [(100, texts[7]), (101, texts[33]), (102, "entirely novel content never seen")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["is_dup"], r["matched_id"], r["est_jaccard"])
        for r in incremental_neardup(
            new, sigs, num_hashes=16, rows_per_band=4, threshold=0.5,
            hash_family="fast", corpus_bands=bands,
        ).collect()
    }
    assert got[100] == (True, 7, 1.0)
    assert got[101] == (True, 33, 1.0)
    assert got[102] == (False, None, None)


def test_neardup_index_append_daily_crawl_loop(spark):
    """The full daily-crawl loop over a STORED index: day-1 corpus indexed
    (write_neardup_index), day-2 batch deduped against it, its NOVEL rows
    appended (append_neardup_index — params come from the index metadata,
    never the caller), and a day-3 batch containing copies of day-2's
    novel rows is flagged as duplicate AGAINST THE APPENDED IDS."""
    from semantic_vector_search_system_spark.operators.dedup import (
        append_neardup_index,
        incremental_neardup,
        read_neardup_index,
        write_neardup_index,
    )

    prefix = "t_nd_append_idx"
    texts = {
        i: f"corpus doc {i} body {' '.join(str(i * j) for j in range(1, 9))}"
        for i in range(30)
    }
    corpus = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    novel_100 = "fresh crawl content about entirely new subject matter alpha"
    novel_101 = "another previously unseen page on a different topic beta"
    try:
        write_neardup_index(
            corpus, prefix, num_hashes=16, rows_per_band=4,
            hash_family="fast", n_buckets=4,
        )

        def serve(batch):
            sigs, bands, meta = read_neardup_index(spark, prefix)
            return {
                r["doc_id"]: (r["is_dup"], r["matched_id"])
                for r in incremental_neardup(
                    batch, sigs, num_hashes=meta["num_hashes"],
                    rows_per_band=meta["rows_per_band"], threshold=0.5,
                    shingle_n=meta["shingle_n"], hash_family=meta["hash_family"],
                    corpus_bands=bands, corpus_hash_family=meta["hash_family"],
                ).collect()
            }

        day2 = spark.createDataFrame(
            [(100, novel_100), (101, novel_101), (102, texts[7])],
            "doc_id long, text string",
        )
        got2 = serve(day2)
        assert got2[100] == (False, None) and got2[101] == (False, None)
        assert got2[102] == (True, 7)
        append_neardup_index(
            day2.filter(~F.col("doc_id").isin(102)), prefix
        )
        day3 = spark.createDataFrame(
            [(200, novel_100), (201, novel_101), (202, "still never seen gamma")],
            "doc_id long, text string",
        )
        got3 = serve(day3)
        assert got3[200] == (True, 100) and got3[201] == (True, 101)
        assert got3[202] == (False, None)
    finally:
        for t in ("_sigs", "_bands", "_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")


def test_incremental_neardup_family_mismatch_fails_loudly(spark):
    """Cross-family serving must raise, not silently estimate jaccard 0:
    (a) the dtype backstop catches fast-family band digests vs an md5
    batch; (b) the explicit corpus_hash_family declaration catches families
    the schema cannot distinguish (r5 ADVICE)."""
    import pytest as _pytest

    from semantic_vector_search_system_spark.operators.dedup import (
        incremental_neardup,
        minhash_band_signatures_vectorized,
        minhash_signatures_fast,
        minhash_signatures_vectorized,
    )

    corpus = spark.createDataFrame(
        [(i, f"doc {i} {' '.join(str(i * j) for j in range(8))}") for i in range(10)],
        "doc_id long, text string",
    )
    new = corpus.limit(2).select(
        (F.col("doc_id") + 100).alias("doc_id"), "text"
    )
    fast_bands = minhash_band_signatures_vectorized(corpus, num_hashes=8)
    fast_sigs = minhash_signatures_vectorized(corpus, num_hashes=8)
    with _pytest.raises(ValueError, match="fast-family arithmetic"):
        incremental_neardup(
            new, fast_sigs, hash_family="md5", corpus_bands=fast_bands
        )
    md5_sigs = minhash_signatures_fast(corpus, num_hashes=8, hash_family="md5")
    with _pytest.raises(ValueError, match="hash_family='md5'"):
        incremental_neardup(
            new, md5_sigs, hash_family="fast", corpus_hash_family="md5"
        )


# ---------------------------------------------------------------------------
# SemDeDup (clustered semantic dedup, Abbas et al. 2023 semantics)
# ---------------------------------------------------------------------------

def _angle_vec(theta_deg: float) -> list[float]:
    import math

    t = math.radians(theta_deg)
    return [math.cos(t), math.sin(t), 0.0]


def test_semdedup_far_policy_triangular_chain(spark):
    """Chain a~b~c with a!~c: the released-SemDeDup rule (triangular max
    over ALL earlier members, kept or not) keeps ONLY the first member of
    the keep-order — a dropped member still shields its own near-twins.
    keep="far" orders by (cent_sim asc, id asc), so the member FARTHEST
    from the centroid survives."""
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    # centroid 0 at angle 0; members at 10/25/40 degrees: adjacent pairs
    # cos(15deg)=0.966 >= 0.9, far pair cos(30deg)=0.866 < 0.9.
    # Second centroid (z axis) gets one lone member -> always kept.
    rows = [
        (1, _angle_vec(10.0)),
        (2, _angle_vec(25.0)),
        (3, _angle_vec(40.0)),
        (4, [0.0, 0.1, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])],
        "cent_id bigint, cvec array<double>",
    )
    for mode in ("expr", "fast"):
        out = {r["vec_id"]: r for r in
               semdedup(emb, cents, threshold=0.9, keep="far", assign=mode).collect()}
        # id 3 (40deg) has the LOWEST cent_sim -> first in order -> kept;
        # id 2 (25deg) within 15deg of 3 -> dropped; id 1 (10deg) is 30deg
        # from kept 3 but 15deg from DROPPED 2 -> still dropped.
        assert {i for i, r in out.items() if r["kept"]} == {3, 4}, mode
        assert out[1]["cent_id"] == 0 and out[4]["cent_id"] == 1

    # keep="min_id": order by id -> 1 kept, 2 dropped (15deg from 1),
    # 3 dropped (15deg from dropped 2).
    out = {r["vec_id"]: r["kept"] for r in
           semdedup(emb, cents, threshold=0.9, keep="min_id").collect()}
    assert {i for i, k in out.items() if k} == {1, 4}


def test_semdedup_expr_fast_parity(spark):
    """The declarative (oracle) and fused-Arrow forms agree row-for-row on
    real data: same assignment, same keep decision, cent_sim within float
    tolerance."""
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter("vec_id < 8").selectExpr(
        "vec_id AS cent_id", "embedding AS cvec"
    )
    a = {r["vec_id"]: r for r in
         semdedup(emb, cents, threshold=0.32, keep="far", assign="expr").collect()}
    b = {r["vec_id"]: r for r in
         semdedup(emb, cents, threshold=0.32, keep="far", assign="fast").collect()}
    assert set(a) == set(b) and len(a) == 500
    for vid in a:
        assert a[vid]["cent_id"] == b[vid]["cent_id"]
        assert a[vid]["kept"] == b[vid]["kept"]
        assert abs(a[vid]["cent_sim"] - b[vid]["cent_sim"]) < 1e-9
    # the threshold is inside the similarity mass -> both classes present
    kept = sum(1 for r in a.values() if r["kept"])
    assert 0 < kept < 500


def test_semdedup_matches_python_oracle(spark):
    """Seeded random corpus with planted near-duplicates vs a brute-force
    numpy reference of the full SemDeDup rule (argmax assignment with
    ascending-cent_id ties, per-cluster keep-order, triangular max)."""
    import numpy as np

    from semantic_vector_search_system_spark.operators.similarity import semdedup

    rng = np.random.default_rng(7)
    n, dim, k, tau = 240, 16, 5, 0.985
    X = rng.normal(size=(n, dim))
    for i in range(0, 60, 3):  # plant near-dup pairs across the corpus
        X[i + 1] = X[i] + rng.normal(scale=0.02, size=dim)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = Xn[:k].copy()

    def py_semdedup(keep: str) -> dict[int, bool]:
        S = Xn @ C.T
        # ascending cent_id columns: argmax first-max = lowest-cent_id tie
        assign = np.argmax(S, axis=1)
        cent_sim = S[np.arange(n), assign]
        kept = {}
        for c in range(k):
            ids = np.where(assign == c)[0]
            if keep == "far":
                order = ids[np.lexsort((ids, cent_sim[ids]))]
            else:
                order = np.sort(ids)
            for pos, i in enumerate(order):
                prior = order[:pos]
                kept[int(i)] = not (
                    len(prior) and (Xn[prior] @ Xn[i]).max() >= tau
                )
        return kept

    emb = spark.createDataFrame(
        [(i, [float(x) for x in Xn[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [float(x) for x in C[c]]) for c in range(k)],
        "cent_id bigint, cvec array<double>",
    )
    for keep in ("far", "min_id"):
        expect = py_semdedup(keep)
        got = {r["vec_id"]: r["kept"] for r in
               semdedup(emb, cents, threshold=tau, keep=keep,
                        assign="fast", block_rows=32).collect()}
        assert got == expect, keep
        assert sum(1 for v in expect.values() if not v) >= 15  # planted dups fired


def test_semdedup_fast_form_single_exchange(spark):
    """100 TB property of the fused form: assignment+vector transport is
    one narrow Arrow stage; the ONLY Exchange in the whole plan is the
    cent_id group shuffle."""
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter("vec_id < 8").selectExpr(
        "vec_id AS cent_id", "embedding AS cvec"
    )
    plan = semdedup(emb, cents, threshold=0.32, assign="fast")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan[:4000]


def test_semdedup_null_vector_treated_as_zero(spark):
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.001]), (3, None)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cent_id bigint, cvec array<double>"
    )
    out = {r["vec_id"]: r for r in
           semdedup(emb, cents, threshold=0.9, keep="min_id", assign="fast").collect()}
    assert out[3]["kept"] and out[3]["cent_id"] == 0 and out[3]["cent_sim"] == 0.0
    assert out[1]["kept"] and not out[2]["kept"]


def test_incremental_semdedup_equals_full_corpus_run(spark):
    """The crawl-loop contract at embedding granularity: processing a
    corpus as id-ordered batches through incremental_semdedup (stored
    member state updated per batch) yields EXACTLY semdedup(keep="min_id")
    of the whole corpus — including the shielding behavior of DROPPED
    stored members."""
    import numpy as np

    from semantic_vector_search_system_spark.operators.similarity import (
        incremental_semdedup,
        semdedup,
        write_semdedup_index,
    )

    rng = np.random.default_rng(11)
    n, dim, k, tau = 150, 12, 4, 0.985
    X = rng.normal(size=(n, dim))
    # plant near-dup pairs that straddle the batch boundaries (batches of
    # 50): originals in batch 1, twins in batches 2 and 3 — plus a
    # shielding chain: 7~58 and 58~109 with 7!~109 must drop BOTH 58 and
    # 109 even though 58 is itself dropped when 109 arrives.
    for a, b in [(3, 61), (9, 120), (40, 72), (45, 145), (7, 58), (58, 109)]:
        X[b] = X[a] + rng.normal(scale=0.02, size=dim)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in Xn[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [float(x) for x in Xn[c]]) for c in range(k)],
        "cent_id bigint, cvec array<double>",
    )
    full = {r["vec_id"]: (r["cent_id"], r["kept"]) for r in
            semdedup(emb, cents, threshold=tau, keep="min_id",
                     assign="fast").collect()}
    assert sum(1 for _, kk in full.values() if not kk) >= 5

    for t in ("inc_sd_members", "inc_sd_cents", "inc_sd_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        # seed the index EMPTY then feed id-ordered batches
        write_semdedup_index(emb.limit(0), cents, "inc_sd", threshold=tau)
        got = {}
        for lo in range(0, n, 50):
            batch = emb.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 50)
            )
            for r in incremental_semdedup(batch, "inc_sd").collect():
                got[r["vec_id"]] = (r["cent_id"], r["kept"])
        assert got == full
    finally:
        for t in ("inc_sd_members", "inc_sd_cents", "inc_sd_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_semdedup_prebuilt_index_and_replay(spark):
    """A batch against a PREBUILT corpus index: near-twins of corpus
    members drop, novel vectors survive; update_index=False leaves state
    alone (same batch replays identically), update_index=True makes a
    batch twin drop on replay."""
    from semantic_vector_search_system_spark.operators.similarity import (
        incremental_semdedup,
        write_semdedup_index,
    )

    corpus = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
        "cent_id bigint, cvec array<double>",
    )
    batch = spark.createDataFrame(
        [(10, [1.0, 0.01, 0.0]),   # twin of corpus 0
         (11, [0.5, 0.0, 0.9])],   # novel
        "vec_id bigint, embedding array<double>",
    )
    for t in ("pre_sd_members", "pre_sd_cents", "pre_sd_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_semdedup_index(corpus, cents, "pre_sd", threshold=0.95)
        for _ in range(2):
            out = {r["vec_id"]: r["kept"] for r in incremental_semdedup(
                batch, "pre_sd", update_index=False).collect()}
            assert out == {10: False, 11: True}
        # with the update, a later twin of batch-kept 11 must drop
        assert {r["vec_id"]: r["kept"] for r in incremental_semdedup(
            batch, "pre_sd").collect()} == {10: False, 11: True}
        twin = spark.createDataFrame(
            [(20, [0.5, 0.001, 0.9])], "vec_id bigint, embedding array<double>"
        )
        assert [r["kept"] for r in
                incremental_semdedup(twin, "pre_sd").collect()] == [False]
    finally:
        for t in ("pre_sd_members", "pre_sd_cents", "pre_sd_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_incremental_semdedup_stored_side_never_shuffles(spark):
    """100 TB property from STORAGE: the members table (bucketBy cent_id)
    feeds the cogroup straight from its FileScan — the corpus state is
    scanned and probed, never re-shuffled; the plan's ONLY Exchange is the
    batch's own cent_id grouping."""
    import numpy as np

    from semantic_vector_search_system_spark.operators.similarity import (
        incremental_semdedup,
        write_semdedup_index,
    )

    rng = np.random.default_rng(3)
    X = rng.normal(size=(200, 8))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in Xn[i]]) for i in range(200)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [float(x) for x in Xn[c]]) for c in range(4)],
        "cent_id bigint, cvec array<double>",
    )
    for t in ("gate_sd_members", "gate_sd_cents", "gate_sd_meta"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    try:
        write_semdedup_index(emb, cents, "gate_sd", threshold=0.99)
        batch = spark.createDataFrame(
            [(1000, [float(x) for x in Xn[5]])],
            "vec_id bigint, embedding array<double>",
        )
        out = incremental_semdedup(batch, "gate_sd", update_index=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert "Bucketed: true" in final, final[:2500]
        assert final.count("Exchange") == 1, final[:2500]
        # the one Exchange keys the BATCH side (under the assign kernel),
        # not the stored FileScan
        ex = final.find("Exchange hashpartitioning")
        scan = final.find("FileScan parquet")
        assert 0 <= ex < scan, final[:2500]
    finally:
        for t in ("gate_sd_members", "gate_sd_cents", "gate_sd_meta"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_semdedup_float32_scoring_parity_on_separated_data(spark):
    """score_dtype="float32" (the bench path, ~2x BLAS) must agree with
    the float64 default whenever pair similarities are not borderline —
    the planted-chain geometry has >=0.06 margins around the threshold."""
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    rows = [
        (1, _angle_vec(10.0)),
        (2, _angle_vec(25.0)),
        (3, _angle_vec(40.0)),
        (4, [0.0, 0.1, 1.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0]), (1, [0.0, 0.0, 1.0])],
        "cent_id bigint, cvec array<double>",
    )
    f64 = {r["vec_id"]: r["kept"] for r in semdedup(
        emb, cents, threshold=0.9, keep="far", assign="fast").collect()}
    f32 = {r["vec_id"]: r["kept"] for r in semdedup(
        emb, cents, threshold=0.9, keep="far", assign="fast",
        score_dtype="float32").collect()}
    assert f64 == f32 == {1: False, 2: False, 3: True, 4: True}


def test_semdedup_fast_join_strategy_parity(spark):
    """assign="fast_join" (skinny Python output + JVM vec join — the
    measured local/CPU-bound winner) is row-identical to the fused
    carry form on real data."""
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter("vec_id < 8").selectExpr(
        "vec_id AS cent_id", "embedding AS cvec"
    )
    a = sorted(map(tuple, semdedup(
        emb, cents, threshold=0.32, keep="far", assign="fast").collect()))
    b = sorted(map(tuple, semdedup(
        emb, cents, threshold=0.32, keep="far", assign="fast_join").collect()))
    assert a == b


def test_semdedup_inline_strategy_parity_and_single_exchange(spark):
    """assign="inline" (r14, the bench path: scalar-UDF struct assignment
    on the carried row — no Arrow re-encode of the vector column out of
    Python AND no id rejoin) is row-identical to the fused carry form on
    real data, at both scoring dtypes, and its plan keeps the fused
    form's 100 TB property: the ONLY Exchange is the cent_id group
    shuffle, which moves the vectors exactly once."""
    from semantic_vector_search_system_spark.operators.similarity import semdedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter("vec_id < 8").selectExpr(
        "vec_id AS cent_id", "embedding AS cvec"
    )
    for dt in ("float64", "float32"):
        # value-pin BOTH scoring dtypes against the fused carry form at
        # the SAME dtype (r14 ADVICE, low: the f32 inline path used to be
        # plan-gated only, leaving its keep-set unpinned)
        a = sorted(map(tuple, semdedup(
            emb, cents, threshold=0.32, keep="far", assign="fast",
            score_dtype=dt,
        ).collect()))
        plan_df = semdedup(
            emb, cents, threshold=0.32, keep="far", assign="inline",
            score_dtype=dt,
        )
        # read the plan BEFORE executing: a finalized AQE plan string
        # repeats the Exchange in its "Initial Plan" section
        plan = plan_df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan[:4000]
        assert a == sorted(map(tuple, plan_df.collect())), dt


def test_semdedup_giant_cluster_guard_exact_and_bounded(spark):
    """r7 VERDICT #6: one pathological cluster above max_cluster_rows is
    routed through the pair-grid kernel — output EXACTLY equals the
    ungated single-task run (both keep policies), cross-segment shielding
    included (a dropped member in an early segment still shields its
    near-twin many segments later), and every grid task holds at most
    2*cap rows (enforced by a runtime raise inside the kernel, so this
    test failing-loudly IS the bound proof)."""
    import numpy as np

    from semantic_vector_search_system_spark.operators.similarity import semdedup

    rng = np.random.default_rng(11)
    n, dim, cap, tau = 900, 12, 64, 0.985
    X = rng.normal(size=(n, dim))
    # two centroids; centroid 0 engineered dominant: bias most points
    C = rng.normal(size=(2, dim))
    X[: n - 50] = 0.25 * X[: n - 50] + C[0]  # ~850-member giant cluster
    X[n - 50 :] = 0.25 * X[n - 50 :] + C[1]
    # planted near-dup chains crossing segment boundaries (ids far apart
    # land in different rank segments under keep="min_id")
    for base in (3, 200, 500):
        X[base + 150] = X[base] + rng.normal(scale=0.01, size=dim)
        X[base + 300] = X[base + 150] + rng.normal(scale=0.01, size=dim)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)

    emb = spark.createDataFrame(
        [(i, [float(x) for x in Xn[i]]) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [float(x) for x in Cn[c]]) for c in range(2)],
        "cent_id bigint, cvec array<double>",
    )
    for keep in ("far", "min_id"):
        plain = {
            r["vec_id"]: (r["cent_id"], round(r["cent_sim"], 9), r["kept"])
            for r in semdedup(
                emb, cents, threshold=tau, keep=keep, assign="fast"
            ).collect()
        }
        guarded = {
            r["vec_id"]: (r["cent_id"], round(r["cent_sim"], 9), r["kept"])
            for r in semdedup(
                emb, cents, threshold=tau, keep=keep, assign="fast",
                max_cluster_rows=cap,
            ).collect()
        }
        assert guarded == plain, keep
        assert sum(1 for v in plain.values() if not v[2]) >= 6  # chains fired

    # cap larger than every cluster: pure fused path, same answer
    ungated_cap = {
        r["vec_id"]: r["kept"]
        for r in semdedup(
            emb, cents, threshold=tau, keep="min_id", assign="fast",
            max_cluster_rows=10_000,
        ).collect()
    }
    plain_min = {
        r["vec_id"]: r["kept"]
        for r in semdedup(
            emb, cents, threshold=tau, keep="min_id", assign="fast"
        ).collect()
    }
    assert ungated_cap == plain_min


def test_ivf_topk_filtered_matches_bruteforce_filtered_when_probing_all(spark):
    """Filtered ANN, pre-filter semantics: with nprobe = n_lists (every list
    probed) filtered IVF must equal the exact brute-force top-k of the
    filtered corpus — on BOTH physical faces (HOF + BLAS cogroup)."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.search import (
        topk_bruteforce,
    )
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_topk,
        ivf_topk_fast,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    d = emb.select(
        F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"), "label"
    )
    pred = F.col("label") == 3
    exact = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in topk_bruteforce(
            q, d, k=5, metric="cosine", predicate=pred
        ).collect()
    }
    for face in (ivf_topk, ivf_topk_fast):
        got = {
            (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
            for r in face(q, d, cents, k=5, nprobe=8, predicate=pred).collect()
        }
        assert got == exact, face.__name__
    # and every hit satisfies the predicate (pre-filter, never post-filter)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    assert all(labels[docid] == 3 for docid, _ in exact.values())


def test_ivf_search_partitioned_filtered_pushes_data_filter(spark, tmp_path):
    """Filtered serving against the cent_id-partitioned index: the metadata
    predicate reaches the parquet reader as a pushed data filter stacked on
    the cent_id partition filter, and results equal the in-memory filtered
    ivf_topk on identical centroids/nprobe."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_search_partitioned,
        ivf_topk,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        write_vector_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    d = emb.select(
        F.col("vec_id").alias("docid"), F.col("embedding").alias("vec"), "label"
    )
    dl = ivf_assign_fast(d, cents, id_col="docid", vec_col="vec", nprobe=1).select(
        "docid", "cent_id"
    )
    idx = str(tmp_path / "ivf_index_meta")
    # label rides into the index — write_vector_index persists every column
    write_vector_index(d.join(dl, "docid"), idx, partition_by="cent_id")

    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    pred = F.col("label") == 3
    expected = {
        (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
        for r in ivf_topk(q, d, cents, k=5, nprobe=2, predicate=pred).collect()
    }
    for strategy in ("broadcast", "cogroup"):
        served = ivf_search_partitioned(
            spark, idx, cents, q, k=5, nprobe=2, predicate=pred,
            strategy=strategy,
        )
        got = {
            (r["qid"], r["rank"]): (r["docid"], round(r["score"], 6))
            for r in served.collect()
        }
        assert got == expected, strategy
        plan = served._jdf.queryExecution().executedPlan().toString()
        # the index scan (one of several scans in the plan) must carry the
        # predicate as a PUSHED data filter, not a post-scan Filter node
        assert any(
            "EqualTo(label,3)" in seg.split("]", 1)[0]
            for seg in plan.split("PushedFilters: [")[1:]
        ), strategy


def test_neardup_index_tombstone_and_compact(spark):
    """Right-to-be-forgotten in the stored dedup index (r9b): tombstoned
    ids stop matching IMMEDIATELY (serve-time broadcast anti-join mask,
    O(delete-batch) write), compaction folds the mask into storage
    (bucket spec preserved, tombstone table truncated), and the index
    keeps accepting appends afterwards."""
    from semantic_vector_search_system_spark.operators.dedup import (
        append_neardup_index,
        compact_neardup_index,
        incremental_neardup,
        read_neardup_index,
        tombstone_neardup_index,
        write_neardup_index,
    )

    prefix = "t_nd_tomb_idx"
    texts = {
        i: f"corpus doc {i} body {' '.join(str(i * j) for j in range(1, 9))}"
        for i in range(20)
    }
    corpus = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def serve(batch):
        sigs, bands, meta = read_neardup_index(spark, prefix)
        return {
            r["doc_id"]: (r["is_dup"], r["matched_id"])
            for r in incremental_neardup(
                batch, sigs, num_hashes=meta["num_hashes"],
                rows_per_band=meta["rows_per_band"], threshold=0.5,
                shingle_n=meta["shingle_n"], hash_family=meta["hash_family"],
                corpus_bands=bands, corpus_hash_family=meta["hash_family"],
            ).collect()
        }

    probe = spark.createDataFrame(
        [(100, texts[7]), (101, texts[3])], "doc_id long, text string"
    )
    try:
        write_neardup_index(
            corpus, prefix, num_hashes=16, rows_per_band=4,
            hash_family="fast", n_buckets=4,
        )
        before = serve(probe)
        assert before[100] == (True, 7) and before[101] == (True, 3)
        sigs_full = spark.read.table(f"{prefix}_sigs").count()

        # tombstone doc 7: its copy must stop matching at once, doc 3's not
        assert tombstone_neardup_index(spark, prefix, [7]) == 1
        after = serve(probe)
        assert after[100] == (False, None), "tombstoned id still matches"
        assert after[101] == (True, 3)
        # storage untouched until compaction (the mask is serve-time)
        assert spark.read.table(f"{prefix}_sigs").count() == sigs_full

        stats = compact_neardup_index(spark, prefix)
        assert stats["tombstones_folded"] == 1
        assert stats["sigs_rows"] == sigs_full - 16  # doc 7's 16 sig rows
        assert spark.read.table(f"{prefix}_tombstones").count() == 0
        assert serve(probe) == after  # identical serving post-compact
        # bucket spec survived the staging swap (insertInto still works)
        desc = spark.sql(f"DESCRIBE EXTENDED {prefix}_sigs").collect()
        desc_txt = "\n".join(f"{r[0]} {r[1]}" for r in desc)
        assert "Num Buckets 4" in desc_txt or "`doc_id`" in desc_txt

        # the loop continues: append a novel doc, then its recrawl matches
        novel = spark.createDataFrame(
            [(300, "totally fresh page about tombstones and compaction")],
            "doc_id long, text string",
        )
        append_neardup_index(novel, prefix)
        got = serve(spark.createDataFrame(
            [(301, "totally fresh page about tombstones and compaction")],
            "doc_id long, text string",
        ))
        assert got[301] == (True, 300)
    finally:
        for t in ("_sigs", "_bands", "_meta", "_tombstones",
                  "_sigs_staging", "_bands_staging"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")


def test_neardup_reindexed_id_clears_tombstone(spark):
    """The r9 ADVICE window, dedup-index flavor: an id that is tombstoned
    and then legitimately RE-INDEXED (append_neardup_index) must be
    servable again immediately — the append clears its tombstone.  Before
    the fix the stale tombstone kept masking the fresh signatures, and
    compaction folded them out of storage entirely."""
    from semantic_vector_search_system_spark.operators.dedup import (
        append_neardup_index,
        compact_neardup_index,
        incremental_neardup,
        read_neardup_index,
        tombstone_neardup_index,
        write_neardup_index,
    )

    prefix = "t_nd_reidx"
    texts = {
        i: f"corpus doc {i} body {' '.join(str(i * j) for j in range(1, 9))}"
        for i in range(10)
    }
    corpus = spark.createDataFrame(list(texts.items()), "doc_id long, text string")

    def serve(batch):
        sigs, bands, meta = read_neardup_index(spark, prefix)
        return {
            r["doc_id"]: (r["is_dup"], r["matched_id"])
            for r in incremental_neardup(
                batch, sigs, num_hashes=meta["num_hashes"],
                rows_per_band=meta["rows_per_band"], threshold=0.5,
                shingle_n=meta["shingle_n"], hash_family=meta["hash_family"],
                corpus_bands=bands, corpus_hash_family=meta["hash_family"],
            ).collect()
        }

    probe = spark.createDataFrame([(100, texts[7])], "doc_id long, text string")
    try:
        write_neardup_index(
            corpus, prefix, num_hashes=16, rows_per_band=4,
            hash_family="fast", n_buckets=4,
        )
        # delete doc 7, then RE-INDEX the same id (recrawl after deletion)
        assert tombstone_neardup_index(spark, prefix, [7]) == 1
        assert serve(probe)[100] == (False, None)
        append_neardup_index(
            spark.createDataFrame([(7, texts[7])], "doc_id long, text string"),
            prefix,
        )
        # the re-index closed the tombstone: id 7 serves again at once
        assert spark.read.table(f"{prefix}_tombstones").count() == 0
        assert serve(probe)[100] == (True, 7), "re-indexed id still masked"
        # and compaction keeps (not folds out) the re-indexed signatures
        compact_neardup_index(spark, prefix)
        assert serve(probe)[100] == (True, 7)
    finally:
        for t in ("_sigs", "_bands", "_meta", "_tombstones",
                  "_sigs_staging", "_bands_staging",
                  "_sigs_old", "_bands_old"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")


def test_clear_tombstones_staging_swap_and_noop_skip(spark):
    """r10 ADVICE (medium): _clear_id_tombstones must not rewrite the
    tombstone table IN PLACE — a crash mid-overwrite would drop ALL
    pending tombstones (unrelated right-to-be-forgotten requests
    silently lost).  Pins the two new behaviors: (a) a batch that
    intersects ZERO tombstones leaves the table's physical files
    untouched (no churn on the common no-op path), (b) a real clear
    goes through the _staging + rename-aside swap, surviving a stale
    _staging leftover from a prior crash."""
    from semantic_vector_search_system_spark.operators.dedup import (
        _clear_id_tombstones,
    )

    prefix = "t_nd_clear"
    tname = f"{prefix}_tombstones"
    try:
        spark.createDataFrame(
            [(1,), (2,), (3,)], "doc_id long"
        ).write.mode("overwrite").format("parquet").saveAsTable(tname)

        # (a) no intersection -> no rewrite: physical files identical
        before = sorted(spark.read.table(tname).inputFiles())
        _clear_id_tombstones(
            spark, prefix,
            spark.createDataFrame([(99,)], "doc_id long"), "doc_id",
        )
        assert sorted(spark.read.table(tname).inputFiles()) == before
        assert spark.read.table(tname).count() == 3

        # (b) real clear via staging swap — plant a stale _staging first
        spark.createDataFrame(
            [(42,)], "doc_id long"
        ).write.mode("overwrite").format("parquet").saveAsTable(
            f"{tname}_staging"
        )
        _clear_id_tombstones(
            spark, prefix,
            spark.createDataFrame([(2,)], "doc_id long"), "doc_id",
        )
        left = {r["doc_id"] for r in spark.read.table(tname).collect()}
        assert left == {1, 3}
        # swap consumed the staging table; no _old left behind
        assert not spark.catalog.tableExists(f"{tname}_staging")
        assert not spark.catalog.tableExists(f"{tname}_old")
    finally:
        for t in ("", "_staging", "_old"):
            spark.sql(f"DROP TABLE IF EXISTS {tname}{t}")


def test_ivf_search_partitioned_live_after_upsert_and_delete(spark, tmp_path):
    """Search-after-mutation correctness on the mutable index: live=True
    returns the UPSERTED vector (not the superseded generation), drops
    deleted ids entirely, and live=False still sees the raw append-only
    history; compaction makes both views agree.  The mask rides AFTER
    partition pruning (plan-gated: partition filters still present)."""
    import pyspark.sql.functions as F
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_search_partitioned,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        compact_vector_index,
        delete_from_vector_index,
        upsert_vector_index,
        write_vector_index,
    )

    # two well-separated lists; docs d1/d2 in list 0's orbit, d3 in list 1's
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "cent_id int, cvec array<float>"
    )
    base = spark.createDataFrame(
        [
            ("d1", [0.9, 0.1], 0),
            ("d2", [0.8, 0.2], 0),
            ("d3", [0.1, 0.9], 1),
        ],
        "docid string, vec array<float>, cent_id int",
    )
    idx = str(tmp_path / "mut_ivf")
    write_vector_index(base, idx, partition_by="cent_id", batch=0)
    q = spark.createDataFrame([("q1", [1.0, 0.0])], "qid string, qvec array<float>")

    top = ivf_search_partitioned(
        spark, idx, cents, q, k=1, nprobe=1, live=True
    ).collect()
    assert [(r["docid"],) for r in top] == [("d1",)]

    # upsert flips d2 to be the best match for q1 (d1 superseded away
    # from the query); delete removes d1 entirely afterwards
    upd = spark.createDataFrame(
        [("d2", [1.0, 0.0], 0)], "docid string, vec array<float>, cent_id int"
    )
    upsert_vector_index(spark, idx, upd, id_col="docid", batch=1, partition_by="cent_id")
    live_top = ivf_search_partitioned(
        spark, idx, cents, q, k=3, nprobe=1, live=True
    ).collect()
    assert [r["docid"] for r in live_top] == ["d2", "d1"]
    assert live_top[0]["score"] == pytest.approx(1.0)
    # the superseded d2 generation is gone from the live view (one d2 row)
    assert sum(1 for r in live_top if r["docid"] == "d2") == 1
    # live=False sees the raw history: BOTH d2 generations rank
    raw_top = ivf_search_partitioned(
        spark, idx, cents, q, k=3, nprobe=1, live=False
    ).collect()
    assert sum(1 for r in raw_top if r["docid"] == "d2") == 2

    delete_from_vector_index(
        spark, idx, spark.createDataFrame([("d1",)], "docid string"), id_col="docid"
    )
    after_del = ivf_search_partitioned(
        spark, idx, cents, q, k=3, nprobe=1, live=True
    )
    assert [r["docid"] for r in after_del.collect()] == ["d2"]
    # partition pruning survives the tombstone mask
    plan = after_del._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cent_id" in plan.split("PartitionFilters")[1][:200]

    # compaction folds the mask: raw search now equals live search
    compact_vector_index(spark, idx, id_col="docid", partition_by="cent_id")
    raw_after = ivf_search_partitioned(
        spark, idx, cents, q, k=3, nprobe=1, live=False
    ).collect()
    assert [r["docid"] for r in raw_after] == ["d2"]


def test_ivf_drift_signal_fires_on_shifted_batch(spark):
    """r11 VERDICT #6: serving an IVF codebook over a MUTATING index decays
    silently when upserts shift the vector distribution.  The drift
    detector compares a new batch's mean nearest-centroid cosine against
    the codebook's training-time quality: a planted shifted batch must
    fire needs_retrain; an unshifted batch must not."""
    import random

    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assignment_quality,
        ivf_drift_signal,
        train_ivf_centroids,
    )

    rng = random.Random(7)
    modes = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
             [0.0, 0.0, 10.0, 0.0]]
    rows = []
    for i in range(240):
        m = modes[i % 3]
        rows.append((i, [c + rng.gauss(0, 0.5) for c in m]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = train_ivf_centroids(emb, n_lists=3, max_iter=5)

    train_q = ivf_assignment_quality(emb, cents)
    assert train_q["n"] == 240 and train_q["mean_assign_sim"] > 0.95

    # unshifted batch: same modes, fresh noise -> no signal
    same = spark.createDataFrame(
        [(1000 + i, [c + rng.gauss(0, 0.5) for c in modes[i % 3]])
         for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    sig_same = ivf_drift_signal(train_q, ivf_assignment_quality(same, cents))
    assert sig_same["needs_retrain"] is False, sig_same

    # shifted batch: a NEW mode the codebook never saw -> signal fires
    shifted = spark.createDataFrame(
        [(2000 + i, [rng.gauss(0, 0.5), rng.gauss(0, 0.5),
                     rng.gauss(0, 0.5), 10.0 + rng.gauss(0, 0.5)])
         for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    sig_shift = ivf_drift_signal(
        train_q, ivf_assignment_quality(shifted, cents)
    )
    assert sig_shift["needs_retrain"] is True, sig_shift
    assert sig_shift["drop"] > sig_same["drop"]


def test_ivf_retrain_index_after_drift(spark, tmp_path):
    """Drift → retrain → serve (the r12 completion of the drift signal):
    after a shifted upsert batch fires needs_retrain, ivf_retrain_index
    rewrites the index re-partitioned on a fresh codebook through the
    crash-safe generation swap — tombstones fold in, the new codebook
    absorbs the new mode (signal clears), and partitioned live serving
    finds the shifted vectors."""
    import os
    import random

    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_assignment_quality,
        ivf_drift_signal,
        ivf_retrain_index,
        ivf_search_partitioned,
        train_ivf_centroids,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        upsert_vector_index,
        write_vector_index,
    )

    rng = random.Random(11)
    modes = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
             [0.0, 0.0, 10.0, 0.0]]
    base_rows = [
        (i, [c + rng.gauss(0, 0.4) for c in modes[i % 3]])
        for i in range(180)
    ]
    emb = spark.createDataFrame(base_rows, "docid long, vec array<double>")
    cents = train_ivf_centroids(emb, n_lists=3, vec_col="vec", max_iter=5)
    train_q = ivf_assignment_quality(
        emb, cents, id_col="docid", vec_col="vec"
    )

    idx = str(tmp_path / "drift_idx")
    assigned = ivf_assign_fast(
        emb, cents, id_col="docid", vec_col="vec", nprobe=1
    ).select("docid", "cent_id")
    write_vector_index(
        emb.join(assigned, "docid"), idx, partition_by="cent_id", batch=0
    )

    # shifted upsert batch: a NEW mode on the 4th axis
    shifted = spark.createDataFrame(
        [(1000 + i, [rng.gauss(0, 0.4), rng.gauss(0, 0.4),
                     rng.gauss(0, 0.4), 10.0 + rng.gauss(0, 0.4)])
         for i in range(60)],
        "docid long, vec array<double>",
    )
    sh_assigned = ivf_assign_fast(
        shifted, cents, id_col="docid", vec_col="vec", nprobe=1
    ).select("docid", "cent_id")
    upsert_vector_index(
        spark, idx, shifted.join(sh_assigned, "docid"),
        id_col="docid", partition_by="cent_id",
    )
    sig = ivf_drift_signal(
        train_q,
        ivf_assignment_quality(shifted, cents, id_col="docid", vec_col="vec"),
    )
    assert sig["needs_retrain"] is True

    # retrain with room for the new mode; index rewritten via gen swap
    split_before = spark.conf.get("spark.sql.files.maxPartitionBytes")
    new_cents = ivf_retrain_index(
        spark, idx, n_lists=4, id_col="docid", vec_col="vec", max_iter=5
    )
    assert os.path.islink(idx)
    assert not os.path.exists(idx + "__tombstones")  # folded by the rewrite
    assert spark.read.parquet(idx).count() == 240  # all live rows, once
    # r13 plan shape: the pre-write repartition(n_lists, cent_id) bounds
    # output at ~one data file per list (a plain partitionBy write from T
    # tasks sprays up to T x n_lists small files — file explosion at scale)
    data_files = [
        os.path.join(root, f)
        for root, _d, fs in os.walk(os.path.realpath(idx))
        for f in fs
        if f.endswith(".parquet")
    ]
    lists = {
        p.split("cent_id=")[1].split("/")[0]
        for p in data_files
        if "cent_id=" in p
    }
    assert len(data_files) <= 4, data_files  # <= one file per list
    assert len(lists) >= 1
    # the split-size override is restored after the rewrite
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == split_before

    # the new codebook absorbs the shifted mode: signal clears
    sig2 = ivf_drift_signal(
        ivf_assignment_quality(emb, new_cents, id_col="docid", vec_col="vec"),
        ivf_assignment_quality(
            shifted, new_cents, id_col="docid", vec_col="vec"
        ),
    )
    assert sig2["needs_retrain"] is False, sig2

    # partitioned live serving over the retrained index finds the
    # shifted vectors (their list exists now)
    q = shifted.limit(2).select(
        F.col("docid").alias("qid"), F.col("vec").alias("qvec")
    )
    hits = ivf_search_partitioned(
        spark, idx, new_cents, q, k=1, nprobe=1, live=True,
        id_col="docid", vec_col="vec",
    )
    got = {r["qid"]: r["docid"] for r in hits.collect()}
    assert all(qid == docid for qid, docid in got.items())  # self-hit top-1


def test_ivf_assign_inline_parity_and_zero_shuffle(spark):
    """r13: ivf_assign_inline must (a) assign every row to exactly the list
    ivf_assign_fast(nprobe=1) picks (shared tie-break kernel), (b) pass
    EVERY input column through unchanged, and (c) compile to a plan with
    NO Exchange — the point of the operator is that the retrain/re-layout
    path stops shuffling the full vector relation just to reattach the
    cent_id column."""
    import pyspark.sql.functions as F

    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_assign_inline,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    d = emb.select(
        F.col("vec_id").alias("docid"),
        F.col("embedding").alias("vec"),
        (F.col("vec_id") % 5).alias("extra"),  # a carried payload column
    )

    inline = ivf_assign_inline(d, cents, vec_col="vec")
    assert inline.columns == ["docid", "vec", "extra", "cent_id"]

    want = {
        r["docid"]: r["cent_id"]
        for r in ivf_assign_fast(
            d, cents, id_col="docid", vec_col="vec", nprobe=1
        ).collect()
    }
    rows = inline.collect()
    assert {r["docid"]: r["cent_id"] for r in rows} == want
    # payload survives untouched
    assert all(r["extra"] == r["docid"] % 5 for r in rows)
    assert all(len(r["vec"]) > 0 for r in rows)

    plan = inline._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan  # vectors never shuffle

    # empty-centroid failure is named, like the fast form
    import pytest as _pytest

    no_cents = cents.filter(F.lit(False))
    with _pytest.raises(ValueError, match="centroids relation is empty"):
        ivf_assign_inline(d, no_cents, vec_col="vec")


def test_drift_retrain_lifecycle_recall_and_reader_grace(spark, tmp_path):
    """r13 VERDICT #4 — the drift→retrain loop CLOSED end-to-end: churn
    an index until ivf_drift_signal fires, retrain, and assert (a) the
    masked live view stays exact through the whole cycle, (b) self-hit
    recall@1 on the retrained index recovers to the pre-churn floor for
    BOTH old and shifted vectors, and (c) a reader pinned to the
    pre-retrain generation stays consistent THROUGH the swap (the
    one-generation grace).  SCALE.md's retrain-cadence paragraph cites
    this test."""
    import os
    import random

    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_fast,
        ivf_assignment_quality,
        ivf_drift_signal,
        ivf_retrain_index,
        ivf_search_partitioned,
        train_ivf_centroids,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        read_live_index,
        upsert_vector_index,
        write_vector_index,
    )

    rng = random.Random(23)
    modes = [[10.0, 0.0, 0.0, 0.0], [0.0, 10.0, 0.0, 0.0],
             [0.0, 0.0, 10.0, 0.0]]

    def jitter(mode):
        return [c + rng.gauss(0, 0.3) for c in mode]

    base_rows = [(i, jitter(modes[i % 3])) for i in range(150)]
    emb = spark.createDataFrame(base_rows, "docid long, vec array<double>")
    cents = train_ivf_centroids(emb, n_lists=3, vec_col="vec", max_iter=5)
    train_q = ivf_assignment_quality(emb, cents, id_col="docid", vec_col="vec")

    idx = str(tmp_path / "lifecycle_idx")
    assigned = ivf_assign_fast(
        emb, cents, id_col="docid", vec_col="vec", nprobe=1
    ).select("docid", "cent_id")
    write_vector_index(
        emb.join(assigned, "docid"), idx, partition_by="cent_id", batch=0
    )

    def self_hit_recall(query_rows, codebook):
        q = spark.createDataFrame(
            query_rows, "qid long, qvec array<double>"
        )
        hits = ivf_search_partitioned(
            spark, idx, codebook, q, k=1, nprobe=1, live=True,
            id_col="docid", vec_col="vec",
        )
        got = {r["qid"]: r["docid"] for r in hits.collect()}
        return sum(1 for qid, d in got.items() if qid == d) / len(query_rows)

    base_queries = [(i, v) for i, v in base_rows[:12]]
    recall_pre = self_hit_recall(base_queries, cents)
    assert recall_pre >= 0.9

    # churn in batches of a NEW 4th-axis mode until the signal fires
    # (consecutive-batch gating is the operator's documented contract;
    # here each batch is equally shifted, so firing within 3 is a bug
    # bound, not a tuning choice)
    shifted_rows, fired = [], False
    for b in range(3):
        batch_rows = [
            (1000 + 100 * b + i,
             [rng.gauss(0, 0.3), rng.gauss(0, 0.3), rng.gauss(0, 0.3),
              10.0 + rng.gauss(0, 0.3)])
            for i in range(40)
        ]
        shifted_rows += batch_rows
        batch = spark.createDataFrame(
            batch_rows, "docid long, vec array<double>"
        )
        b_assigned = ivf_assign_fast(
            batch, cents, id_col="docid", vec_col="vec", nprobe=1
        ).select("docid", "cent_id")
        upsert_vector_index(
            spark, idx, batch.join(b_assigned, "docid"),
            id_col="docid", partition_by="cent_id",
        )
        sig = ivf_drift_signal(
            train_q,
            ivf_assignment_quality(
                batch, cents, id_col="docid", vec_col="vec"
            ),
        )
        if sig["needs_retrain"]:
            fired = True
            break
    assert fired, "drift signal never fired under a sustained new mode"

    # retrain #1: migrates to the symlink layout, folds tombstones
    new_cents = ivf_retrain_index(
        spark, idx, n_lists=4, id_col="docid", vec_col="vec", max_iter=5
    )
    assert os.path.islink(idx)
    n_live = 150 + len(shifted_rows)
    assert spark.read.parquet(idx).count() == n_live

    # (b) recall recovers on the retrained index — old AND shifted modes
    shifted_queries = [(i, v) for i, v in shifted_rows[:12]]
    assert self_hit_recall(base_queries, new_cents) >= recall_pre - 0.05
    assert self_hit_recall(shifted_queries, new_cents) >= 0.9

    # replacement churn on the retrained index: masked serve parity —
    # the replaced ids must serve exactly their NEW vectors through the
    # tombstone mask (one live generation each)
    repl_rows = [(i, jitter(modes[i % 3])) for i in range(20)]
    repl = spark.createDataFrame(repl_rows, "docid long, vec array<double>")
    r_assigned = ivf_assign_fast(
        repl, new_cents, id_col="docid", vec_col="vec", nprobe=1
    ).select("docid", "cent_id")
    out = upsert_vector_index(
        spark, idx, repl.join(r_assigned, "docid"),
        id_col="docid", partition_by="cent_id",
    )
    assert out["replaced"] == 20
    live = read_live_index(spark, idx, id_col="docid")
    assert live.count() == n_live
    got = {
        r["docid"]: r["vec"]
        for r in live.filter(F.col("docid") < 20).collect()
    }
    assert got == {i: v for i, v in repl_rows}  # new vectors, exactly once
    assert self_hit_recall([(i, v) for i, v in repl_rows[:8]], new_cents) >= 0.9

    # (c) a reader pinned to the CURRENT generation stays consistent
    # through the next swap: the grace policy keeps the previous
    # generation's files intact for one full maintenance cycle
    pinned_dir = os.path.realpath(idx)
    pinned = spark.read.parquet(pinned_dir)
    n_pinned = pinned.count()
    ivf_retrain_index(
        spark, idx, n_lists=4, id_col="docid", vec_col="vec", max_iter=5
    )
    assert os.path.realpath(idx) != pinned_dir  # the swap happened
    assert os.path.isdir(pinned_dir)  # grace: old generation intact
    assert pinned.count() == n_pinned  # pinned reader still consistent
    assert spark.read.parquet(idx).count() == n_live  # new gen complete
