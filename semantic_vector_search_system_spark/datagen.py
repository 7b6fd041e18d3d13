"""Seeded synthetic corpus / query / qrels generators (SURVEY §2.1 S4–S5).

The reference's generator module was archived out of the repo; behavior is
recovered from `dist/documentation/PROJECT_DETAILED.txt:32-35,43-50` and the
re-implementation in `experiments/create_qs.py:10-36`:

* documents: id, title, text (random token soup), category, timestamp, source
* queries:   a seeded sample of q_count docs; query text = first 200 chars of
  the doc's text (`create_qs.py:17`)
* qrels:     exactly {qid -> [source doc id]} (`create_qs.py:30`)

Spark-first: ``spark.range(n)`` + deterministic column expressions — fully
distributed, resumable (`spark.range(start, n)` replicates the reference's
``--start`` offset, PROJECT_DETAILED.txt:94-97), no driver-side loop. Every
doc additionally gets a unique planted token ``keyword_{row}`` (FIXTURES.md)
so exact search has a known answer at any scale.

Determinism: all randomness flows from ``stable_hash64`` of the row id +
seed — identical output for any partitioning, any cluster size, any run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import stable_hash64
from .functions.text import query_snippet

VOCAB = [
    "spark", "vector", "search", "index", "query", "table", "join", "merge",
    "sort", "filter", "window", "batch", "stream", "hash", "scan", "group",
    "order", "part", "line", "customer", "data", "row", "column", "value",
    "key", "fast", "slow", "big", "small", "the", "a", "agg", "dup",
]

CATEGORIES = ["sports", "news", "tech", "science", "finance", "culture"]
SOURCES = ["web", "wiki", "feed", "archive", "api"]


def _pick(expr, options: list[str]):
    """Deterministically pick one of ``options`` from a hash expression."""
    arr = F.array(*[F.lit(o) for o in options])
    return F.element_at(arr, (F.pmod(expr, F.lit(len(options))) + 1).cast("int"))


def generate_documents(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    min_tokens: int = 20,
    max_tokens: int = 200,
    start: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic document corpus as a DataFrame (schemas.DOCUMENT shape)."""
    rng = F.col("id_num")

    def h(salt: str):
        return stable_hash64(F.concat(F.lit(f"{seed}:{salt}:"), rng))

    n_tok = (F.pmod(h("ntok"), F.lit(max_tokens - min_tokens + 1)) + min_tokens).cast("int")
    # token i of row r = VOCAB[hash(seed:tok:r:i) % |V|]; one planted unique
    # keyword_{r} appended so each doc is exactly retrievable.
    vocab_arr = F.array(*[F.lit(t) for t in VOCAB])
    tokens = F.transform(
        F.sequence(F.lit(1), n_tok),
        lambda i: F.element_at(
            vocab_arr,
            (
                F.pmod(
                    stable_hash64(F.concat(F.lit(f"{seed}:tok:"), rng, F.lit(":"), i)),
                    F.lit(len(VOCAB)),
                )
                + 1
            ).cast("int"),
        ),
    )
    text = F.concat_ws(" ", F.concat(tokens, F.array(F.concat(F.lit("keyword_"), rng))))

    df = spark.range(start, n, 1, num_partitions) if num_partitions else spark.range(start, n)
    return df.select(
        F.col("id").alias("id_num"),
    ).select(
        F.concat(F.lit("d"), rng).alias("id"),
        F.concat(F.lit("Title "), rng).alias("title"),
        text.alias("text"),
        _pick(h("cat"), CATEGORIES).alias("category"),
        F.date_add(F.lit("2024-01-01").cast("date"), F.pmod(h("ts"), F.lit(365)).cast("int")).alias(
            "timestamp"
        ),
        _pick(h("src"), SOURCES).alias("source"),
    )


def generate_queries_and_qrels(
    docs: DataFrame, q_count: int, seed: int = 42, snippet_len: int = 200
) -> tuple[DataFrame, DataFrame]:
    """Seeded doc sample -> (queries, qrels) (reference `create_qs.py:22-31`).

    Query = first ``snippet_len`` chars of the sampled doc's text; the qrel
    for each query is exactly the source doc id. The sample is a deterministic
    hash-ordered top-q (not ``rand()`` — identical across partitionings).
    """
    from pyspark.sql import Window

    sampled = (
        docs.select("id", "text")
        .withColumn("__h", stable_hash64(F.concat(F.lit(f"{seed}:qsample:"), F.col("id"))))
        .orderBy("__h")
        .limit(q_count)
        # global window is fine HERE: it runs on the post-limit relation
        # (q_count rows, <= a few hundred by construction), never the corpus
        .withColumn("__i", F.row_number().over(Window.orderBy("__h")))
    )
    queries = sampled.select(
        F.concat(F.lit("q"), F.col("__i")).alias("id"),
        query_snippet("text", snippet_len).alias("query"),
    )
    qrels = sampled.select(
        F.concat(F.lit("q"), F.col("__i")).alias("qid"),
        F.col("id").alias("docid"),
    )
    return queries, qrels
