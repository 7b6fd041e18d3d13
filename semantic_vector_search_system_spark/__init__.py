"""sivbp-spark: PySpark-native semantic vector search & evaluation engine.

A brand-new engine with the query and data-processing capabilities of the
reference system `belilovi02/Semantic-Vector-Search-System` (see SURVEY.md),
re-expressed Spark-first: declarative DataFrame/SQL plans optimized by
Catalyst, Arrow-batched Pandas UDFs only on the genuinely numeric hot path
(matrix-multiply scoring), and Structured Streaming for incremental ingest.

Layout:
    session      -- SparkSession factory with scale-oriented defaults
    schemas      -- explicit StructTypes for every record shape (SURVEY §1.2)
    functions/   -- scalar/vector/text column expressions (SURVEY §2.7)
    operators/   -- encode, search, metrics, dedup, similarity, text analysis
    sources/     -- readers/writers (JSONL corpus, parquet vector index, sinks)
    plans/       -- experiment grids (H1/H2/H3) and reporting (SURVEY §3)
    streaming/   -- Structured Streaming ingest + windowed aggregation
"""

__version__ = "0.1.0"


def __getattr__(name):
    """Lazy top-level API: the operators users reach for, importable as
    ``from semantic_vector_search_system_spark import topk_bruteforce`` —
    lazy so importing the package never requires an active SparkContext."""
    _API = {
        "get_spark": ("session", "get_spark"),
        "generate_documents": ("datagen", "generate_documents"),
        "generate_queries_and_qrels": ("datagen", "generate_queries_and_qrels"),
        "HashingEncoder": ("operators.encode", "HashingEncoder"),
        "HashingEncoderFast": ("operators.encode", "HashingEncoderFast"),
        "TfIdfEncoder": ("operators.encode", "TfIdfEncoder"),
        "get_encoder": ("operators.encode", "get_encoder"),
        "topk_bruteforce": ("operators.search", "topk_bruteforce"),
        "topk_bruteforce_expr": ("operators.search", "topk_bruteforce_expr"),
        "evaluate_all": ("operators.metrics", "evaluate_all"),
        "per_query_metrics": ("operators.metrics", "per_query_metrics"),
        "exact_dedup": ("operators.dedup", "exact_dedup"),
        "minhash_signatures": ("operators.dedup", "minhash_signatures_fast"),
        "lsh_candidate_pairs": ("operators.dedup", "lsh_candidate_pairs"),
        "ngram_jaccard_pairs": ("operators.dedup", "ngram_jaccard_pairs"),
        "simhash": ("operators.textanalysis", "simhash"),
        "doc_quality": ("operators.textanalysis", "doc_quality"),
        "langid_confusion": ("operators.textanalysis", "langid_confusion"),
        "cosine_self_join": ("operators.similarity", "cosine_self_join"),
        "ivf_topk": ("operators.similarity", "ivf_topk"),
        "ivf_search_partitioned": ("operators.similarity", "ivf_search_partitioned"),
        "train_ivf_centroids": ("operators.similarity", "train_ivf_centroids"),
        "incremental_neardup": ("operators.dedup", "incremental_neardup"),
        "write_neardup_index": ("operators.dedup", "write_neardup_index"),
        "read_neardup_index": ("operators.dedup", "read_neardup_index"),
        "append_neardup_index": ("operators.dedup", "append_neardup_index"),
        "asof_join": ("operators.asof", "asof_join"),
        "upsert_by_key": ("operators.upsert", "upsert_by_key"),
        "latency_stats": ("operators.latency", "latency_stats"),
    }
    if name in _API:
        import importlib

        mod, attr = _API[name]
        return getattr(importlib.import_module(f".{mod}", __name__), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
