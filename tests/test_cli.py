"""CLI surface: the reference's main.py actions end-to-end via _dispatch."""

from __future__ import annotations

import argparse
import json


def _ns(**kw):
    return argparse.Namespace(**kw)


def test_cli_generate_encode_search_evaluate(spark, tmp_path, capsys):
    from semantic_vector_search_system_spark.__main__ import _dispatch

    corpus = str(tmp_path / "corpus")
    assert _dispatch(spark, _ns(action="generate", n_docs=300, queries=20, seed=7,
                                start=0, out=corpus)) == 0
    gen = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert gen["n_docs"] == 300

    index = str(tmp_path / "index")
    assert _dispatch(spark, _ns(action="encode", docs=f"{corpus}/documents.parquet",
                                out=index, model="hashing_fast", dim=64,
                                partition_by="category")) == 0
    enc = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert enc["total_items"] == 300

    ret = str(tmp_path / "ret")
    assert _dispatch(spark, _ns(action="search", index=index,
                                queries=f"{corpus}/queries.parquet", k=5,
                                model="hashing_fast", dim=64, filter=None,
                                out=ret)) == 0
    sr = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert sr["retrievals"] == 100  # 20 queries x top-5

    assert _dispatch(spark, _ns(action="evaluate", retrievals=ret,
                                qrels=f"{corpus}/qrels.parquet", k="1,5")) == 0
    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ev["n_queries"] == 20 and 0.0 <= ev["map"] <= 1.0
    # prefix-snippet self-retrieval on a 300-doc corpus should rank well
    assert ev["r_at_5"] > 0.5


def test_cli_hybrid_filter_restricts(spark, tmp_path, capsys):
    from semantic_vector_search_system_spark.__main__ import _dispatch

    corpus = str(tmp_path / "c2")
    _dispatch(spark, _ns(action="generate", n_docs=200, queries=10, seed=3,
                         start=0, out=corpus))
    index = str(tmp_path / "i2")
    _dispatch(spark, _ns(action="encode", docs=f"{corpus}/documents.parquet",
                         out=index, model="hashing_fast", dim=32, partition_by=None))
    ret = str(tmp_path / "r2")
    _dispatch(spark, _ns(action="search", index=index,
                         queries=f"{corpus}/queries.parquet", k=5,
                         model="hashing_fast", dim=32, filter="category=sports",
                         out=ret))
    capsys.readouterr()
    docs = spark.read.parquet(f"{corpus}/documents.parquet")
    sports = {r["id"] for r in docs.filter("category = 'sports'").collect()}
    got = {r["docid"] for r in spark.read.parquet(ret).collect()}
    assert got <= sports and got


def test_public_api_surface():
    import semantic_vector_search_system_spark as pkg

    for name in ["topk_bruteforce", "evaluate_all", "exact_dedup", "asof_join",
                 "HashingEncoderFast", "cosine_self_join", "get_spark"]:
        assert callable(getattr(pkg, name))
    import pytest

    with pytest.raises(AttributeError):
        pkg.not_a_real_api


def test_cli_tfidf_end_to_end(spark, tmp_path, capsys):
    from semantic_vector_search_system_spark.__main__ import _dispatch

    corpus = str(tmp_path / "c3")
    _dispatch(spark, _ns(action="generate", n_docs=150, queries=8, seed=5,
                         start=0, out=corpus))
    index = str(tmp_path / "i3")
    _dispatch(spark, _ns(action="encode", docs=f"{corpus}/documents.parquet",
                         out=index, model="tfidf", dim=64, partition_by=None))
    ret = str(tmp_path / "r3")
    _dispatch(spark, _ns(action="search", index=index,
                         queries=f"{corpus}/queries.parquet", k=5,
                         model="tfidf", dim=64, filter=None, out=ret))
    _dispatch(spark, _ns(action="evaluate", retrievals=ret,
                         qrels=f"{corpus}/qrels.parquet", k="5"))
    import json

    ev = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ev["n_queries"] == 8
    # TF-IDF prefix-snippet self-retrieval should work well at 150 docs
    assert ev["r_at_5"] >= 0.5
