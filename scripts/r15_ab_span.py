"""Interleaved A/B: span_dedup expr vs arrow chunker at the 1M bench
geometry (the bench's skewed corpus: 8,192-copy boilerplate + 10k pair
dups).  Noop sink, labeled jobs, alternating runs in ONE session so
co-tenant load hits both faces equally."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.datagen import generate_documents
from semantic_vector_search_system_spark.operators.lexical import span_dedup
from semantic_vector_search_system_spark.session import get_spark

spark = get_spark("r15-ab-span")
spark.sparkContext.setLogLevel("ERROR")

n = 1_000_000
idnum = F.substring("id", 2, 18).cast("long")
hot = "terms of service boilerplate text repeated verbatim across the scraped mirror sites"
gid = (idnum / 2).cast("long").cast("string")
pair_words = "duplicated article body shared by syndication partner".split()
pair_text = F.concat_ws(" ", *[F.concat(F.lit(w + "_"), gid) for w in pair_words])
docs = (
    generate_documents(spark, n, seed=42, num_partitions=32)
    .withColumn(
        "text",
        F.when(idnum < 8192, F.lit(hot))
        .when((idnum >= 100_000) & (idnum < 120_000), pair_text)
        .otherwise(F.col("text")),
    )
    .cache()
)
docs.count()


def run(chunker: str) -> float:
    spark.sparkContext.setJobDescription(f"span_dedup chunker={chunker}")
    t0 = time.time()
    span_dedup(docs, span_tokens=20, doc_id="id", chunker=chunker).write.format(
        "noop"
    ).mode("overwrite").save()
    return round(time.time() - t0, 2)


# JIT/codegen warmup for both faces, then alternate
print("warm expr", run("expr"), flush=True)
print("warm arrow", run("arrow"), flush=True)
res = {"expr": [], "arrow": []}
for i in range(3):
    for c in ("expr", "arrow"):
        res[c].append(run(c))
        print(i, c, res[c][-1], flush=True)
print("RESULT", res, flush=True)
spark.stop()
