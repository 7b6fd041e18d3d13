"""IR evaluation metrics as DataFrame aggregations (SURVEY §2.4 A1–A4).

Reference semantics preserved exactly (`evaluation/metrics.py`):

* precision@k  = |top-k ∩ relevant| / len(top-k)   — divides by the number
  retrieved (<= k), not k, when fewer than k docs exist (`metrics.py:9-12`);
  0.0 when nothing retrieved (`metrics.py:7-8`).
* recall@k     = |top-k ∩ relevant| / |relevant|; 0.0 on empty qrels
  (`metrics.py:16-17`).
* AP           = mean over *hit ranks* of (hits-so-far / rank); 0.0 for
  queries with no hits (`metrics.py:40-54`); MAP = mean of AP over queries.
* MRR          = mean of 1/first-hit-rank (0 when no hit) — present in the
  reference's H2 summaries (BASELINE.md).

Input is the explicit retrieval relation ``(qid, docid, rank)`` (ordering as
a rank column — SURVEY §1.1) plus the qrels relation ``(qid, docid)``.

Scale notes: one shuffle keyed by qid for the per-query aggregation, then a
tiny global agg. The qrels join broadcasts when qrels are small; at 100 TB
retrieval scale both sides are pre-partitioned by qid so the join is
shuffle-free under co-partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.quantize import quantize


def label_hits(retrievals: DataFrame, qrels: DataFrame) -> DataFrame:
    """Mark each retrieved row with is_rel + the query's relevant-doc count.

    J2 left join + J3 membership (SURVEY §2.3) in one pass: broadcast-join
    retrievals against qrels on (qid, docid) for the hit flag, plus a
    broadcast join of per-qid relevant counts.
    """
    rel_counts = qrels.groupBy("qid").agg(F.count("*").alias("n_rel"))
    hits = qrels.select("qid", "docid").withColumn("is_rel", F.lit(1))
    return (
        retrievals.join(F.broadcast(hits), ["qid", "docid"], "left")
        .fillna({"is_rel": 0})
        .join(F.broadcast(rel_counts), "qid", "left")
        .fillna({"n_rel": 0})
    )


def per_query_metrics(
    retrievals: DataFrame, qrels: DataFrame, k_values: tuple[int, ...] = (5, 10)
) -> DataFrame:
    """Per-query p@k / r@k for each k, plus AP and RR.

    Returns one row per qid with columns ``p_at_k``, ``r_at_k`` (per k),
    ``ap``, ``rr``. Queries present in ``retrievals`` only (the reference
    iterates over queries and looks up retrievals, default [] —
    `metrics.py:58-61`; callers wanting all-queries semantics should outer
    join the query set and fillna(0)).
    """
    labeled = label_hits(retrievals, qrels)
    w = Window.partitionBy("qid").orderBy("rank")
    labeled = labeled.withColumn("hits_at", F.sum("is_rel").over(w))  # W5 running hit count
    # precision at each hit rank (AP terms): hits_at / rank where is_rel=1
    aggs = []
    for k in k_values:
        in_k = F.when(F.col("rank") <= k, F.col("is_rel")).otherwise(F.lit(0))
        n_ret_k = F.sum(F.when(F.col("rank") <= k, 1).otherwise(0))
        n_hit_k = F.sum(in_k)
        aggs.append(
            F.when(n_ret_k > 0, n_hit_k.cast("double") / n_ret_k).otherwise(F.lit(0.0)).alias(f"p_at_{k}")
        )
        aggs.append(
            F.when(F.first("n_rel") > 0, n_hit_k.cast("double") / F.first("n_rel"))
            .otherwise(F.lit(0.0))
            .alias(f"r_at_{k}")
        )
    ap_terms = F.when(F.col("is_rel") == 1, F.col("hits_at").cast("double") / F.col("rank"))
    # Order-free AP (r9 VERDICT #2 — the ROUND-over-double-agg purge): each
    # term is a deterministic per-row double; quantize-12 + exact DECIMAL
    # sum + ONE IEEE division makes the mean independent of partition merge
    # order (a raw double AVG is not — float addition doesn't associate).
    # quantize, not F.round (r10 VERDICT #2): Spark/DuckDB round() diverge
    # at exact .5 boundaries; the FLOOR form is IEEE-pinned on both faces.
    ap_sum = F.sum(quantize(ap_terms, 12).cast("decimal(25,12)"))
    ap_n = F.count(ap_terms)
    aggs.append(
        F.when(ap_n > 0, ap_sum.cast("double") / ap_n).otherwise(F.lit(0.0)).alias("ap")
    )
    first_hit = F.min(F.when(F.col("is_rel") == 1, F.col("rank")))
    aggs.append(F.coalesce(F.lit(1.0) / first_hit, F.lit(0.0)).alias("rr"))
    return labeled.groupBy("qid").agg(*aggs)


def evaluate_all(
    retrievals: DataFrame, qrels: DataFrame, k_values: tuple[int, ...] = (5, 10)
) -> DataFrame:
    """Mean-over-queries summary (reference ``evaluate_all``, `metrics.py:56-64`).

    One row: ``p_at_k``/``r_at_k`` per k, ``map``, ``mrr``, ``n_queries``.
    """
    pq = per_query_metrics(retrievals, qrels, k_values)

    def _mean12(col: str):
        # Partition-order-free mean (r9 VERDICT #2): the per-query values
        # are deterministic doubles; quantize-12 + exact DECIMAL sum + one
        # IEEE division is bit-stable under any partitioning / merge order,
        # where a plain double AVG is not.  quantize, not F.round (r10
        # VERDICT #2): r_at_k = hits/n_rel and ap = dec12-sum/n_hits are
        # rationals that LAND on round()'s divergent .5 boundaries when
        # the reduced denominator carries 2^13 (r@k) or an even hit count
        # meets an odd scaled sum (ap).
        s = F.sum(quantize(F.col(col), 12).cast("decimal(25,12)"))
        return (s.cast("double") / F.count(col)).alias(col)

    aggs = []
    for k in k_values:
        aggs.append(_mean12(f"p_at_{k}"))
        aggs.append(_mean12(f"r_at_{k}"))
    aggs.append(_mean12("ap").alias("map"))
    aggs.append(_mean12("rr").alias("mrr"))
    aggs.append(F.count("*").alias("n_queries"))
    return pq.agg(*aggs)


def dcg_discount_literals(k: int) -> tuple[list[str], list[str]]:
    """The nDCG discount table as LITERAL TEXT: per-rank ``1/log2(r+1)``
    rounded to 12 decimals, plus its exact prefix sums (ideal DCG per
    relevant-count). log2 is transcendental — the house oracle rule bans
    computing it in-engine — but the discounts for rank <= k are a FIXED
    k-entry table, so both engines consume the same literal text and the
    metric stays bit-reproducible. Returns (discounts, prefix_sums)."""
    import math
    from decimal import Decimal

    disc = [round(1.0 / math.log2(r + 1), 12) for r in range(1, k + 1)]
    acc, prefix = Decimal(0), []
    for d in disc:
        acc += Decimal(repr(d))
        prefix.append(repr(float(acc)))
    return [repr(d) for d in disc], prefix


def per_query_ndcg(
    retrievals: DataFrame, qrels: DataFrame, k: int = 10
) -> DataFrame:
    """Binary-relevance nDCG@k per query: ``(qid, n_rel, ndcg_at_k)``.

    DCG = sum of the rank-discount literals at hit ranks <= k (DECIMAL
    sum — order-free); ideal DCG = the prefix-sum literal at
    min(n_rel, k); ndcg = quantize-6 (the cross-engine-safe FLOOR form,
    r10 VERDICT #2 — dcg/idcg is a ratio of 12-dp decimals, exactly the
    rational class that lands on round()'s divergent boundaries) of one
    IEEE division; 0.0 for queries with no relevant docs. Same scale
    shape as the other IR metrics: one qid-keyed aggregation over the
    broadcast-labeled retrievals."""
    disc, prefix = dcg_discount_literals(k)
    labeled = label_hits(retrievals, qrels)
    darr = F.array(*[F.lit(float(d)) for d in disc])
    parr = F.array(*[F.lit(float(p)) for p in prefix])
    term = F.when(
        (F.col("is_rel") == 1) & (F.col("rank") <= k),
        F.element_at(darr, F.col("rank").cast("int")),
    )
    out = labeled.groupBy("qid").agg(
        F.first("n_rel").alias("n_rel"),
        F.sum(term.cast("decimal(38,12)")).cast("double").alias("_dcg"),
    )
    idcg = F.element_at(parr, F.least(F.col("n_rel"), F.lit(k)).cast("int"))
    return out.select(
        "qid",
        "n_rel",
        F.when(
            (F.col("n_rel") > 0) & F.col("_dcg").isNotNull(),
            quantize(F.col("_dcg") / idcg, 6),
        )
        .otherwise(F.lit(0.0))
        .alias(f"ndcg_at_{k}"),
    )
