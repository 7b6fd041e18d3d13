"""Capture .explain('formatted') dumps for the r15 optimization targets.

Usage: python scripts/r15_capture_plans.py <label>
  <label> is 'before' or 'after' — dumps land in plans/r15/<key>_<label>.txt.

Builds a small synthetic churned index (2k vectors, 8 lists) — plan SHAPE
is scale-independent — and dumps:
  * index_compact_rewrite: the live-rewrite plan compact_vector_index
    executes, plus (before only) the two metric-only count plans;
  * span_dedup: the full span_dedup plan at the bench arguments;
  * index_serve_masked: the live=True pruned-scan serving plan.
"""

from __future__ import annotations

import io
import os
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.session import get_spark


def dump(df, path: str, header: str = "") -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    mode = "a" if os.path.exists(path) else "w"
    with open(path, mode) as fh:
        if header:
            fh.write(f"=== {header} ===\n")
        fh.write(buf.getvalue() + "\n")


def main() -> None:
    label = sys.argv[1] if len(sys.argv) > 1 else "before"
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r15",
    )
    spark = get_spark("r15-plans")
    spark.sparkContext.setLogLevel("ERROR")

    from semantic_vector_search_system_spark.datagen import generate_documents
    from semantic_vector_search_system_spark.operators.encode import (
        HashingEncoderFast,
    )
    from semantic_vector_search_system_spark.operators.similarity import (
        ivf_assign_inline,
        ivf_search_partitioned,
        train_ivf_centroids,
    )
    from semantic_vector_search_system_spark.sources.parquet_index import (
        read_live_index,
        upsert_vector_index,
        write_vector_index,
    )

    docs = generate_documents(spark, 2000, seed=42, num_partitions=4)
    enc = HashingEncoderFast(dim=32)
    dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec").cache()
    cents = train_ivf_centroids(dvec, 8, vec_col="vec", seed=7)
    pre_cents = cents.collect()
    assigned = ivf_assign_inline(dvec, cents, vec_col="vec")

    tmp = tempfile.mkdtemp(prefix="r15_plans_")
    idx = f"{tmp}/index"
    write_vector_index(assigned, idx, partition_by="cent_id", batch=0)
    churn = (
        dvec.filter(F.substring("docid", -1, 1) == "7")
        .withColumn("vec", F.transform("vec", lambda c: -c))
    )
    upsert_vector_index(
        spark, idx, ivf_assign_inline(churn, cents, vec_col="vec"),
        id_col="docid", batch=None, partition_by="cent_id",
    )

    # --- compact family: the live-rewrite plan -------------------------
    p = os.path.join(out, f"index_compact_{label}.txt")
    if os.path.exists(p):
        os.remove(p)
    if label == "before":
        live = read_live_index(spark, idx, id_col="docid")
        dump(
            live.repartition(F.col("cent_id")), p,
            "live-rewrite plan (the staging write input)",
        )
        dump(
            spark.read.parquet(idx).groupBy().count(), p,
            "metric-only job 1: n_before = spark.read.parquet(path).count()",
        )
        dump(
            live.groupBy().count(), p,
            "metric-only job 2 (shape): n_after = "
            "spark.read.parquet(staging).count() after the rewrite",
        )
    else:
        from semantic_vector_search_system_spark.sources.parquet_index import (
            _tombstones_path,
            observed_live_view,
            read_optional_parquet,
        )

        tomb = read_optional_parquet(spark, _tombstones_path(idx))
        live, _counts = observed_live_view(spark, idx, tomb, id_col="docid")
        dump(
            live.repartition(F.col("cent_id")), p,
            "live-rewrite plan with n_before/n_after riding it as "
            "CollectMetrics (the ONLY job a compact now runs)",
        )

    # --- masked serve (live=True) --------------------------------------
    one_q = dvec.limit(1).select(
        F.col("docid").alias("qid"), F.col("vec").alias("qvec")
    )
    q_mem = [(r["qid"], r["qvec"]) for r in one_q.collect()]
    p = os.path.join(out, f"index_serve_masked_{label}.txt")
    if os.path.exists(p):
        os.remove(p)
    serve = ivf_search_partitioned(
        spark, idx, cents, one_q, k=1, nprobe=2,
        precollected_centroids=pre_cents, merge="window",
        precollected_queries=q_mem, live=True,
    )
    dump(serve, p, "live=True serving plan (merge=window for plan capture)")

    # --- span_dedup ------------------------------------------------------
    from semantic_vector_search_system_spark.operators.lexical import span_dedup

    p = os.path.join(out, f"span_dedup_{label}.txt")
    if os.path.exists(p):
        os.remove(p)
    kwargs = {}
    if label == "after":
        kwargs["chunker"] = "arrow"
    dump(
        span_dedup(docs, span_tokens=20, doc_id="id", **kwargs), p,
        f"span_dedup plan ({label})",
    )
    spark.stop()
    print("plans captured:", label)


if __name__ == "__main__":
    main()
