"""Golden-record regression test — the reference's unit_test_precision
pattern (`experiments/unit_test_precision.py:1-21`): the 5-doc planted-
keyword fixture's retrievals AND metrics must match the committed golden
file exactly. Any change to tokenization, hashing, normalization, scoring,
ranking or metric semantics trips this."""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.encode import HashingEncoder
from semantic_vector_search_system_spark.operators.metrics import evaluate_all
from semantic_vector_search_system_spark.operators.search import topk_bruteforce_expr

GOLDEN = Path(__file__).parent / "goldens" / "unit_fixture.json"

DOCS = [
    ("d1", "alpha beta gamma keyword_3 delta"),
    ("d2", "epsilon zeta eta theta"),
    ("d3", "iota kappa keyword_5 lambda"),
    ("d4", "mu nu xi omicron pi"),
    ("d5", "rho sigma tau upsilon"),
]
QUERIES = [("q1", "keyword_3"), ("q2", "keyword_5 kappa")]
QRELS = [("q1", "d1"), ("q2", "d3")]


def test_fixture_matches_committed_golden(spark):
    golden = json.loads(GOLDEN.read_text())
    docs = spark.createDataFrame(DOCS, "id string, text string")
    queries = spark.createDataFrame(QUERIES, "id string, text string")
    enc = HashingEncoder(dim=128)
    dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec")
    qvec = enc.encode(queries).select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
    top = topk_bruteforce_expr(qvec, dvec, k=3)

    retrievals: dict = {}
    for r in sorted(top.collect(), key=lambda r: (r["qid"], r["rank"])):
        retrievals.setdefault(r["qid"], []).append([r["docid"], round(r["score"], 6)])
    assert retrievals == golden["retrievals"]

    qrels = spark.createDataFrame(QRELS, "qid string, docid string")
    ev = evaluate_all(top.select("qid", "docid", "rank"), qrels, k_values=(1, 3, 5)).collect()[0]
    got = {k: round(v, 6) if isinstance(v, float) else v for k, v in ev.asDict().items()}
    assert got == golden["metrics"]
