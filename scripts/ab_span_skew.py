"""One-off A/B: span_dedup keep-first under planted boilerplate skew.

r7 VERDICT #1 scenario: ONE 20-token chunk opens >=30% of a 1M-doc
corpus. The window form ships every copy of that chunk's hash to a
single reducer before ranking (row count at the hot key = duplication
factor); the min-struct aggregate form collapses it map-side. This
script measures both forms on the planted corpus AND on the regular
bench corpus, printing one JSON line per cell.

Usage: python scripts/ab_span_skew.py [n_docs] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semantic_vector_search_system_spark.datagen import (  # noqa: E402
    generate_documents,
)
from semantic_vector_search_system_spark.operators.lexical import (  # noqa: E402
    span_dedup,
)
from semantic_vector_search_system_spark.session import get_spark  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("ab-span-skew", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    boiler = " ".join(f"boiler{i}" for i in range(20))  # one exact chunk
    idnum = F.substring("id", 2, 18).cast("long")
    docs = (
        generate_documents(spark, n, seed=42, num_partitions=32)
        .withColumn(
            "text",
            # 30% of docs open with the SAME 20-token boilerplate chunk
            F.when(
                idnum % 10 < 3, F.concat(F.lit(boiler + " "), F.col("text"))
            ).otherwise(F.col("text")),
        )
        .cache()
    )
    docs.count()

    for form in ("agg", "window"):
        times = []
        for _ in range(runs):
            t0 = time.time()
            span_dedup(
                docs, span_tokens=20, doc_id="id", keep_first=form
            ).write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        print(json.dumps({
            "cell": f"span_dedup_skew30_{form}",
            "n_docs": n,
            "times": times,
            "best": min(times),
        }))
    spark.stop()


if __name__ == "__main__":
    main()
