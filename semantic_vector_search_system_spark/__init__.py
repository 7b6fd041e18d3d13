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
