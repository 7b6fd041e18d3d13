"""CLI — the reference's `main.py` actions, Spark-first.

    python -m semantic_vector_search_system_spark generate --n-docs 10000 --out /tmp/corpus
    python -m semantic_vector_search_system_spark encode --docs /tmp/corpus/documents.parquet \
        --out /tmp/index --model hashing --dim 512
    python -m semantic_vector_search_system_spark search --index /tmp/index \
        --queries /tmp/corpus/queries.parquet --k 10 [--filter category=sports]
    python -m semantic_vector_search_system_spark evaluate --retrievals /tmp/retrievals.parquet \
        --qrels /tmp/corpus/qrels.parquet --k 5,10
    python -m semantic_vector_search_system_spark run-grid --out /tmp/grid --h1-sizes 1000 \
        --h2-sizes 1000 --h3-sizes 1000
    python -m semantic_vector_search_system_spark report --results-dir /tmp/grid/results

Mirrors the reference CLI surface (`main.py:11-24` actions; grid semantics
`experiments/auto_run_tests.py`; reporting `produce_h3_summary_and_plots.py`)
with parquet instead of JSONL/memmap interchange (JSONL readers remain
available in sources/jsonl.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="semantic_vector_search_system_spark")
    sub = p.add_subparsers(dest="action", required=True)

    g = sub.add_parser("generate", help="seeded synthetic corpus + queries + qrels")
    g.add_argument("--n-docs", type=int, required=True)
    g.add_argument("--queries", type=int, default=100)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--start", type=int, default=0, help="resumable offset")
    g.add_argument("--out", required=True)

    e = sub.add_parser("encode", help="build the parquet vector index")
    e.add_argument("--docs", required=True)
    e.add_argument("--out", required=True)
    e.add_argument("--model", default="hashing_fast",
                   choices=["hashing", "hashing_fast", "tfidf"])
    e.add_argument("--dim", type=int, default=512)
    e.add_argument("--partition-by", default=None)

    s = sub.add_parser("search", help="exact top-k over the index")
    s.add_argument("--index", required=True)
    s.add_argument("--queries", required=True)
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--model", default="hashing_fast")
    s.add_argument("--dim", type=int, default=512)
    s.add_argument("--filter", default=None, help="hybrid predicate col=value")
    s.add_argument("--out", required=True)

    ev = sub.add_parser("evaluate", help="p@k/r@k/MAP/MRR from retrievals + qrels")
    ev.add_argument("--retrievals", required=True)
    ev.add_argument("--qrels", required=True)
    ev.add_argument("--k", default="5,10")

    r = sub.add_parser("run-grid", help="H1/H2/H3 experiment grid")
    r.add_argument("--out", required=True)
    r.add_argument("--h1-sizes", default="")
    r.add_argument("--h2-sizes", default="")
    r.add_argument("--h3-sizes", default="")
    r.add_argument("--h1-batches", default="100,500,1000")
    r.add_argument("--h1-repeats", type=int, default=1)

    rp = sub.add_parser("report", help="summaries + stats over result records")
    rp.add_argument("--results-dir", required=True)
    rp.add_argument("--metrics", default="metrics.p_at_5,metrics.map")
    rp.add_argument(
        "--artifact-dir", default=None,
        help="also assemble the report artifact (EXPERIMENTS_REPORT.txt + "
        "Bonferroni table; PDF/plots when matplotlib is installed)",
    )

    args = p.parse_args(argv)

    from .session import get_spark

    spark = get_spark(f"sivbp-{args.action}")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        return _dispatch(spark, args)
    finally:
        spark.stop()


def _ints(csv: str) -> tuple[int, ...]:
    return tuple(int(x) for x in csv.split(",") if x.strip())


def _dispatch(spark, args) -> int:
    from pyspark.sql import functions as F

    if args.action == "generate":
        from .datagen import generate_documents, generate_queries_and_qrels

        docs = generate_documents(spark, args.n_docs, seed=args.seed, start=args.start)
        docs.write.mode("overwrite").parquet(f"{args.out}/documents.parquet")
        docs = spark.read.parquet(f"{args.out}/documents.parquet")
        queries, qrels = generate_queries_and_qrels(docs, args.queries, seed=args.seed)
        queries.write.mode("overwrite").parquet(f"{args.out}/queries.parquet")
        qrels.write.mode("overwrite").parquet(f"{args.out}/qrels.parquet")
        print(json.dumps({"n_docs": docs.count(), "n_queries": args.queries, "out": args.out}))
        return 0

    if args.action == "encode":
        from .operators.encode import get_encoder
        from .operators.ingest import ingest_to_index

        docs = spark.read.parquet(args.docs)
        enc = get_encoder(args.model, args.dim)
        if hasattr(enc, "fit"):
            enc.fit(docs)
            enc.save(f"{args.out}_model")  # fitted vocabulary for query encoding
        vec = enc.encode(docs)
        summary = ingest_to_index(
            vec, args.out, db_name="parquet_index", partition_by=args.partition_by
        )
        print(json.dumps(summary.asDict()))
        return 0

    if args.action == "search":
        from .operators.encode import get_encoder
        from .operators.search import topk_bruteforce

        index = spark.read.parquet(args.index)
        queries = spark.read.parquet(args.queries)
        if args.model == "tfidf":
            from .operators.encode import TfIdfEncoder

            enc = TfIdfEncoder.load(f"{args.index}_model", dim=args.dim)
        else:
            enc = get_encoder(args.model, args.dim)
        qvec = enc.encode(queries, text_col="query").select(
            F.col("id").alias("qid"), F.col("vec").alias("qvec")
        )
        pred = None
        if args.filter:
            col, val = args.filter.split("=", 1)
            pred = F.col(col) == val
        dvec = index.select(F.col("id").alias("docid"), "vec", *[
            c for c in index.columns if c not in ("id", "vec")
        ])
        top = topk_bruteforce(qvec, dvec, k=args.k, predicate=pred)
        top.write.mode("overwrite").parquet(args.out)
        print(json.dumps({"retrievals": spark.read.parquet(args.out).count(), "out": args.out}))
        return 0

    if args.action == "evaluate":
        from .operators.metrics import evaluate_all

        ret = spark.read.parquet(args.retrievals)
        qrels = spark.read.parquet(args.qrels)
        row = evaluate_all(ret, qrels, k_values=_ints(args.k)).collect()[0]
        print(json.dumps(row.asDict()))
        return 0

    if args.action == "run-grid":
        from .plans.experiments import build_configs, run_configs_and_collect

        configs = build_configs(
            local_only=True,
            h1_sizes=_ints(args.h1_sizes),
            h2_sizes=_ints(args.h2_sizes),
            h3_sizes=_ints(args.h3_sizes),
            h1_batches=_ints(args.h1_batches),
            h1_repeats=args.h1_repeats,
            models=("hashing",),
        )
        records = run_configs_and_collect(spark, configs, args.out)
        import os

        os.makedirs(f"{args.out}/results", exist_ok=True)
        for i, rec in enumerate(records):
            with open(f"{args.out}/results/auto_test_{i}.json", "w") as f:
                json.dump(rec, f)
        print(json.dumps({"n_runs": len(records),
                          "n_errors": sum(1 for r in records if "error" in r)}))
        return 0

    if args.action == "report":
        from .plans.report import summary_by_size, valid_runs
        from .sources.jsonl import read_result_records

        res = read_result_records(spark, args.results_dir)
        metric_cols = [m for m in args.metrics.split(",") if m]
        ok = valid_runs(res, metric_cols)
        rows = [r.asDict() for r in summary_by_size(ok, metric_cols).collect()]
        out = {"n_valid": ok.count(), "summary": rows}
        if args.artifact_dir:
            from .plans.report_artifact import assemble_report

            out["artifact"] = assemble_report(spark, args.results_dir, args.artifact_dir)
        print(json.dumps(out))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
