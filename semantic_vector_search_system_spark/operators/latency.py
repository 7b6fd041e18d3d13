"""Latency/throughput statistics (SURVEY §2.4 A5–A6).

The reference computes mean/p50/p90/p95/p99 + QPS over per-query wall times
(`evaluation/search_eval.py:15-17,43,68`; `auto_run_tests.py:458-467`) with
exact ``np.percentile``. We use Spark's exact ``percentile`` (not
``percentile_approx``) so golden comparisons hold (SURVEY §7 hard-part (d)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row
from pyspark.sql import functions as F


def latency_stats(
    latencies: DataFrame,
    col: str = "latency_s",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One-row summary matching the reference's query_latency record
    (`auto_run_tests.py:458-467`): mean_s, p{50,90,99}_s, qps."""
    aggs = [
        F.avg(col).alias("mean_s"),
        *[
            F.expr(f"percentile({col}, {p})").alias(f"p{int(p * 100)}_s")
            for p in percentiles
        ],
        (F.count(col) / F.sum(col)).alias("qps"),
    ]
    return latencies.agg(*aggs)


def latency_stats_ms(latencies: DataFrame, col: str = "latency_s") -> DataFrame:
    """search_eval.py:15-17 variant: mean/p95/p99 scaled to milliseconds."""
    return latencies.agg(
        (F.avg(col) * 1000).alias("mean_ms"),
        (F.expr(f"percentile({col}, 0.95)") * 1000).alias("p95_ms"),
        (F.expr(f"percentile({col}, 0.99)") * 1000).alias("p99_ms"),
    )


def measure_query_latencies(run_one, queries: list, n_samples: int | None = 100) -> list[Row]:
    """Driver-side timed execution of single-query searches (the reference
    times each query individually, `auto_run_tests.py:428-467`; per-query
    latency of a distributed engine is driver-observed wall time).

    ``run_one(q)`` executes one query to completion (e.g. ``.count()``).
    Returns rows of (qid, latency_s) to feed :func:`latency_stats`.
    """
    import time

    sample = queries[:n_samples] if n_samples else queries
    out = []
    for q in sample:
        t0 = time.time()
        run_one(q)
        try:
            label = str(q[0])
        except (TypeError, IndexError, KeyError):
            label = str(q)
        out.append(Row(qid=label, latency_s=time.time() - t0))
    return out
