"""Experiment grid runner (SURVEY §3.2): the reference's
`experiments/auto_run_tests.py` re-expressed as one lazy Spark DAG per config.

* ``build_configs`` replicates the H1/H2/H3 grid semantics
  (`auto_run_tests.py:596-656`): H1 ingestion throughput (sizes x DBs x batch
  sizes x repeats), H2 retrieval relevance (sizes x search modes), H3
  embedding-model effect (sizes x models).
* Memoization (P7, `auto_run_tests.py:216-250`): previously-completed configs
  are skipped via a left-anti join of the config batch against the results
  table — the relational form of the reference's existing-result scan.
* Each run: generate (or load) corpus -> encode -> ingest index (H1) or
  search top-k + evaluate (H2/H3) -> one result record row in the
  reference's record shape (§1.2).

The grid loop is driver-side (configs are a handful of rows); all data work
is distributed.
"""

from __future__ import annotations

import time
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..datagen import generate_documents, generate_queries_and_qrels
from ..operators.encode import get_encoder
from ..operators.ingest import ingest_to_index
from ..operators.metrics import evaluate_all
from ..operators.search import topk_bruteforce


@dataclass(frozen=True)
class RunConfig:
    hypothesis: str
    n_docs: int
    target_db: str = "local"
    batch_size: int | None = None
    model_name: str = "hashing"
    dim: int = 512
    sample_queries: int = 100
    search_mode: str = "vector"
    repeat: int = 0


def build_configs(
    local_only: bool = True,
    h1_sizes: tuple[int, ...] = (10_000, 50_000, 100_000, 500_000),
    h2_sizes: tuple[int, ...] = (10_000, 100_000, 1_000_000),
    h3_sizes: tuple[int, ...] = (10_000, 100_000, 1_000_000),
    h1_batches: tuple[int, ...] = (100, 500, 1000),
    h1_repeats: int = 3,
    models: tuple[str, ...] = ("hashing", "tfidf"),
) -> list[RunConfig]:
    """The reference grid (`auto_run_tests.py:596-656`); LOCAL_ONLY=1
    restricts DBs to the in-engine index (`:603-606`)."""
    dbs = ("local",) if local_only else ("local", "weaviate", "pinecone")
    configs: list[RunConfig] = []
    for size in h1_sizes:
        for db in dbs:
            for bs in h1_batches:
                for r in range(h1_repeats):
                    configs.append(
                        RunConfig("H1", size, db, bs, "hashing", 512, 100, "vector", r)
                    )
    for size in h2_sizes:
        for mode in ("vector", "hybrid"):
            configs.append(RunConfig("H2", size, dbs[0], None, "hashing", 512, 100, mode))
    for size in h3_sizes:
        for model in models:
            configs.append(RunConfig("H3", size, dbs[0], None, model, 512, 100, "vector"))
    return configs


def filter_unrun_configs(
    spark: SparkSession, configs: list[RunConfig], results: DataFrame | None
) -> list[RunConfig]:
    """P7 memoization as a left-anti join (`auto_run_tests.py:216-250` —
    same_config keys hypothesis/n_docs/batch_size/model/db/mode/repeat)."""
    if results is None or not configs:
        return configs
    key_cols = [
        "hypothesis", "n_docs", "target_db", "batch_size",
        "model_name", "search_mode", "repeat",
    ]
    # explicit schema: batch_size may be None for every config (H2/H3-only
    # grids), which defeats schema inference
    cfg_schema = (
        "hypothesis string, n_docs long, target_db string, batch_size long, "
        "model_name string, dim int, sample_queries long, search_mode string, repeat long"
    )
    cfg_df = spark.createDataFrame([asdict(c) for c in configs], schema=cfg_schema)
    done = results.select(*[F.col(c) for c in key_cols if c in results.columns]).distinct()
    remaining = cfg_df.join(done, [c for c in key_cols if c in done.columns], "left_anti")
    keep = {
        tuple(r[c] for c in key_cols)
        for r in remaining.collect()
    }
    return [c for c in configs if tuple(asdict(c)[k] for k in key_cols) in keep]


def run_config(
    spark: SparkSession,
    cfg: RunConfig,
    work_dir: str,
    docs: DataFrame | None = None,
    seed: int = 42,
) -> dict:
    """Execute one config end-to-end; returns the reference-shaped result
    record (`auto_run_tests.py:523-532`)."""
    t_start = time.time()
    if docs is None:
        docs = generate_documents(spark, cfg.n_docs, seed=seed)
    else:
        docs = docs.limit(cfg.n_docs)  # P5 size-prefix subsetting
    queries, qrels = generate_queries_and_qrels(docs, cfg.sample_queries, seed=seed)

    enc = get_encoder(cfg.model_name, cfg.dim)
    if hasattr(enc, "fit"):
        enc.fit(docs)
    t_enc0 = time.time()
    dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec", "category")
    qvec = enc.encode(queries, text_col="query").select(
        F.col("id").alias("qid"), F.col("vec").alias("qvec")
    )

    record: dict = {
        "config": asdict(cfg),
        "n_docs": cfg.n_docs,
        "dim": cfg.dim,
    }
    index_path = f"{work_dir}/index_{cfg.hypothesis}_{cfg.n_docs}_{cfg.model_name}"

    if cfg.hypothesis == "H1":
        ingest = ingest_to_index(
            dvec, index_path, db_name=cfg.target_db, batch_size=cfg.batch_size
        )
        record["encode_total_s"] = round(time.time() - t_enc0, 6)
        record["metrics"] = {"ingest": ingest.asDict()}
    else:
        predicate = (F.col("category") == "sports") if cfg.search_mode == "hybrid" else None
        top = topk_bruteforce(qvec, dvec, k=20, predicate=predicate)
        ev = evaluate_all(top.select("qid", "docid", "rank"), qrels, k_values=(5, 10, 20)).collect()[0]
        record["encode_total_s"] = round(time.time() - t_enc0, 6)
        record["metrics"] = {
            **{k: ev[k] for k in ev.asDict() if k.startswith(("p_at_", "r_at_"))},
            "map": ev["map"],
            "mrr": ev["mrr"],
        }
        # query_latency block (reference `auto_run_tests.py:491,514`): timed
        # top-1 single-query runs over a sample, summarized exactly like
        # `measure_offline_query_latency` -> latency_stats
        from ..operators.latency import latency_stats, measure_query_latencies

        dvec_cached = dvec.cache()
        dvec_cached.count()
        q_sample = qvec.limit(min(20, cfg.sample_queries)).collect()

        def run_one(qrow):
            one = spark.createDataFrame([qrow], qvec.schema)
            topk_bruteforce(one, dvec_cached, k=1, predicate=predicate).collect()

        lat_rows = measure_query_latencies(run_one, q_sample, n_samples=None)
        lat_df = spark.createDataFrame(
            [(r["qid"], r["latency_s"]) for r in lat_rows], "qid string, latency_s double"
        )
        record["metrics"]["query_latency"] = {
            k: v for k, v in latency_stats(lat_df).collect()[0].asDict().items()
        }
        dvec_cached.unpersist()
    record["total_wall_s"] = round(time.time() - t_start, 6)
    return record


def run_configs_and_collect(
    spark: SparkSession,
    configs: list[RunConfig],
    work_dir: str,
    results: DataFrame | None = None,
) -> list[dict]:
    """The reference's run_configs_and_collect loop with memoization and
    error sentinels (`auto_run_tests.py:540-552`): a failing config yields an
    ``{"error": ..., "config": ...}`` record instead of aborting the grid —
    the reporting layer's valid-run filter (P6) excludes them."""
    todo = filter_unrun_configs(spark, configs, results)
    out: list[dict] = []
    for cfg in todo:
        try:
            out.append(run_config(spark, cfg, work_dir))
        except Exception as exc:  # sentinel record, grid continues
            out.append({"config": asdict(cfg), "error": f"{type(exc).__name__}: {exc}"})
    return out
