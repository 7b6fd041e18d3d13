"""Skew stress harness (r8 VERDICT #3/#5): measured task-time/row
distributions for the engine's skew-sensitive shapes, at 1M scale.

Three experiments, each reporting per-stage task quantiles from the Spark
REST status API (p50 / p95 / p99 / max of executorRunTime and shuffle-read
records), so "bounded task sizes" is a measured number, not a claim:

A. Connected components over a planted mega-hub graph (one node linked to
   30% of 1M nodes + 100k chain pairs): the unsalted min-label path vs
   ``degree_cap`` salting (operators/dedup.py::connected_components).
B. Zipfian-token equi-join (the bm25 postings shape): a 4M-row exploded
   relation whose hottest token holds ~8% of all rows, joined to per-token
   stats — AQE off (the fat-task baseline) vs AQE skew-split vs broadcast
   (the engine's actual bm25 strategy: query terms broadcast, never a
   tok-keyed shuffle join).
C. Zipfian-category equi-join (the hybrid pre-filter shape): docs with a
   zipfian label joined to an accepted-label relation — same three
   variants.

Findings land in SCALE.md §Skew. Run:  python scripts/skew_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from semantic_vector_search_system_spark.session import get_spark  # noqa: E402


def _api(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    with urllib.request.urlopen(f"{base}/api/v1/{path}") as r:
        return json.loads(r.read())


def _app_id(spark) -> str:
    return _api(spark, "applications")[0]["id"]


def _completed_stage_ids(spark, app) -> set[int]:
    return {
        s["stageId"]
        for s in _api(spark, f"applications/{app}/stages?status=COMPLETE")
    }


QUANTS = "0.5,0.95,0.99,1.0"


def run_measured(spark, app, name: str, fn) -> dict:
    """Run fn(), then summarize the NEW stages: wall-clock plus (a) the
    stage with the largest max-task shuffle-read RECORORDS (the skew
    signal: a fat task reads a hot key's whole partition) and (b) the
    stage with the largest max-task executorRunTime — each with p50/p95/
    p99/max quantiles, so 'bounded task sizes' is a measured number."""
    before = _completed_stage_ids(spark, app)
    t0 = time.time()
    fn()
    wall = time.time() - t0
    stages = []
    for sid in sorted(_completed_stage_ids(spark, app) - before):
        try:
            s = _api(
                spark,
                f"applications/{app}/stages/{sid}/0/taskSummary?quantiles={QUANTS}",
            )
        except Exception:
            continue
        stages.append(
            {
                "stage": sid,
                "run_s": [round(x / 1000.0, 3) for x in s["executorRunTime"]],
                "shuffle_rows": [
                    int(x)
                    for x in s.get("shuffleReadMetrics", {}).get(
                        "readRecords", [0] * 4
                    )
                ],
            }
        )
    by_rows = max(stages, key=lambda s: s["shuffle_rows"][-1], default=None)
    by_time = max(stages, key=lambda s: s["run_s"][-1], default=None)
    out = {
        "name": name,
        "wall_s": round(wall, 2),
        "fattest_by_shuffle_rows": by_rows,
        "fattest_by_runtime": by_time,
    }
    print(json.dumps(out), flush=True)
    return out


def experiment_cc(spark, app):
    from semantic_vector_search_system_spark.operators.dedup import (
        connected_components,
    )

    n, hub = 1_000_000, 300_000
    star = spark.range(1, hub + 1).select(
        F.lit(0).alias("id_a"), F.col("id").alias("id_b")
    )
    chains = (
        spark.range(400_000, 500_000)
        .select(F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b"))
    )
    pairs = star.unionByName(chains).repartition(32).localCheckpoint()

    def run(degree_cap):
        # AQE's small-partition coalescing folds this (few-hundred-MB)
        # graph into 1-2 tasks locally, hiding the per-key skew the
        # experiment measures; at 100 TB partitions stay at size, so
        # disable coalescing to observe the 32-task distribution.
        old = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        try:
            connected_components(
                pairs, small_edge_threshold=0, degree_cap=degree_cap
            ).write.format("noop").mode("overwrite").save()
        finally:
            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.enabled", old
            )

    results = [
        run_measured(spark, app, "cc_megahub_unsalted", lambda: run(None)),
        run_measured(
            spark, app, "cc_megahub_salted_cap10k", lambda: run(10_000)
        ),
    ]
    return results


def _zipf_ids(spark, n_rows: int, n_keys: int, col: str):
    """Zipf-ish key column: key k gets ~ 1/(k+1) mass (harmonic), via
    inverse-CDF on a uniform hash — the hottest key holds ~1/H(n) of all
    rows (~8% at n_keys=1000)."""
    import math

    H = sum(1.0 / k for k in range(1, n_keys + 1))
    # precompute CDF boundaries driver-side; assign by binary-searchable
    # nested ranges is overkill — use pow-law via exponent trick instead:
    # rank = floor(exp(u * ln(n_keys))) gives log-uniform ranks, whose
    # frequency is ~1/rank — close enough to zipf for a skew stress.
    u = (F.abs(F.xxhash64(F.col("id"))) % 1_000_000) / 1_000_000.0
    rank = F.floor(
        F.exp(u * F.lit(math.log(n_keys)))
    )  # 1..n_keys, mass ~ 1/rank
    return spark.range(n_rows).select(
        F.col("id"), rank.cast("long").alias(col)
    )


def experiment_join(spark, app, n_rows: int, n_keys: int, label: str):
    big = _zipf_ids(spark, n_rows, n_keys, "tok").localCheckpoint()
    dim = (
        big.groupBy("tok").agg(F.count("*").alias("df")).localCheckpoint()
    )

    def join_noop(aqe: bool, broadcast: bool):
        confs = {
            "spark.sql.adaptive.enabled": str(aqe).lower(),
            "spark.sql.adaptive.skewJoin.enabled": str(aqe).lower(),
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            # default skew thresholds (256 MB) never trigger at this
            # local scale; scale them to the experiment's MB-sized
            # partitions so the MECHANISM demonstrably fires — at 100 TB
            # the defaults fire the same way on GB-sized hot partitions
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
        }
        old = {k: spark.conf.get(k) for k in confs}
        for k, v in confs.items():
            spark.conf.set(k, v)
        try:
            d = F.broadcast(dim) if broadcast else dim
            (
                big.join(d, "tok")
                .select(F.col("id") + F.col("df"))
                .write.format("noop")
                .mode("overwrite")
                .save()
            )
        finally:
            for k, v in old.items():
                spark.conf.set(k, v)

    return [
        run_measured(
            spark, app, f"{label}_smj_aqe_off",
            lambda: join_noop(aqe=False, broadcast=False),
        ),
        run_measured(
            spark, app, f"{label}_smj_aqe_skewsplit",
            lambda: join_noop(aqe=True, broadcast=False),
        ),
        run_measured(
            spark, app, f"{label}_broadcast_dim",
            lambda: join_noop(aqe=True, broadcast=True),
        ),
    ]


def main():
    spark = get_spark(
        "skew-bench", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = _app_id(spark)
    out = []
    out += experiment_cc(spark, app)
    out += experiment_join(spark, app, 4_000_000, 1_000, "zipf_tok_bm25shape")
    out += experiment_join(spark, app, 2_000_000, 200, "zipf_label_hybridshape")
    print("=== SUMMARY (quantiles p50/p95/p99/max) ===")
    for r in out:
        rw = r["fattest_by_shuffle_rows"] or {}
        rt = r["fattest_by_runtime"] or {}
        print(
            f"{r['name']:40s} wall {r['wall_s']:7.2f}s  "
            f"rows {rw.get('shuffle_rows')} (run {rw.get('run_s')})  |  "
            f"slowest run {rt.get('run_s')}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
