"""Explicit schemas for every record shape in the engine (SURVEY §1.2).

The reference keeps schemas implicit (plain dicts, defensive ``.get``); we pin
them as ``StructType`` so scans prune columns and malformed rows fail fast.
Document fields mirror `ingestion/ingest.py:43` / `weaviate/client.py:74` in
the reference; the result record mirrors `experiments/auto_run_tests.py:523-532`.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Corpus document (reference JSONL schema).
DOCUMENT = StructType(
    [
        StructField("id", StringType(), False),
        StructField("title", StringType(), True),
        StructField("text", StringType(), False),
        StructField("category", StringType(), True),
        StructField("timestamp", DateType(), True),
        StructField("source", StringType(), True),
    ]
)

# Query set: {"id", "query"} (reference `experiments/create_qs.py:29`).
QUERY = StructType(
    [
        StructField("id", StringType(), False),
        StructField("query", StringType(), False),
    ]
)

# Qrels exploded to rows; the reference stores a JSON map qid -> [docid,...]
# (`evaluation/metrics.py:22-27`) — rows are the join-friendly Spark form.
QREL = StructType(
    [
        StructField("qid", StringType(), False),
        StructField("docid", StringType(), False),
    ]
)

# Vector index row: id + dense float32 embedding (reference memmap row,
# `experiments/run_experiments.py:60-68`).
VECTOR = StructType(
    [
        StructField("id", StringType(), False),
        StructField("vec", ArrayType(FloatType(), False), False),
    ]
)

# Retrieval row: ordered results made explicit with a rank column
# (reference keeps dict qid -> ordered list, `auto_run_tests.py:119-145`).
RETRIEVAL = StructType(
    [
        StructField("qid", StringType(), False),
        StructField("docid", StringType(), False),
        StructField("rank", IntegerType(), False),
        StructField("score", DoubleType(), False),
    ]
)

# Per-run experiment result record (reference `auto_run_tests.py:523-532`).
RESULT_CONFIG = StructType(
    [
        StructField("hypothesis", StringType(), True),
        StructField("n_docs", LongType(), True),
        StructField("batch_size", LongType(), True),
        StructField("model_name", StringType(), True),
        StructField("dim", IntegerType(), True),
        StructField("target_db", StringType(), True),
        StructField("sample_queries", LongType(), True),
        StructField("search_mode", StringType(), True),
    ]
)

QUERY_LATENCY = StructType(
    [
        StructField("mean_s", DoubleType(), True),
        StructField("p50_s", DoubleType(), True),
        StructField("p90_s", DoubleType(), True),
        StructField("p99_s", DoubleType(), True),
        StructField("qps", DoubleType(), True),
    ]
)

INGEST_SUMMARY = StructType(
    [
        StructField("total_items", LongType(), True),
        StructField("total_time_s", DoubleType(), True),
        StructField("overall_throughput_vps", DoubleType(), True),
        StructField("db", StringType(), True),
        StructField("batch_size", LongType(), True),
    ]
)
