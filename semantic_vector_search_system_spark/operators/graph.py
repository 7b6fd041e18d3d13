"""Iterative graph centrality over pair relations (PageRank).

Training-data pipelines rank hosts/documents by link or similarity
centrality (the CommonCrawl host-ranking shape) to prioritize crawl and
weight quality. The input here is any undirected pair relation — e.g.
the MinHash-LSH candidate pairs the dedup stack already produces — and
the output is a per-node PageRank after ``n_iter`` synchronous
iterations.

Determinism (the catalog-oracle contract): every probability is rounded
to 12 decimals after each IEEE step, per-node message sums run in
DECIMAL(38,12) (exact under any partitioning/AQE re-plan), and the
teleport term is computed as ``(1.0 - damping) / N`` in-engine on both
sides — bit-identical iteration trajectories in Spark and DuckDB.

Scale: one iteration = one equi-join of the edge list with the
node-state relation (state is O(nodes); broadcast when it fits, else a
co-partitioned shuffle join — repartition both by node and the
partitioning is reused across iterations) + one keyed aggregation on the
destination. Hub nodes skew the message aggregation; the DECIMAL sum is
algebraic, so map-side partial aggregation collapses hub fan-in before
the exchange (same argument as the keep-first de-skew). Lineage is
truncated per round with ``localCheckpoint`` (reliable checkpoints on a
cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import quantize


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    n_iter: int = 3,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    round_digits: int = 12,
) -> DataFrame:
    """PageRank over an undirected pair graph: ``(node, degree,
    pagerank)`` for every node incident to an edge. Symmetrized edges
    mean every node has out-degree >= 1 — no dangling-mass term."""
    if n_iter < 0:
        raise ValueError("n_iter must be >= 0")
    und = (
        pairs.select(F.col(src_col).alias("s"), F.col(dst_col).alias("d"))
        .union(
            pairs.select(F.col(dst_col).alias("s"), F.col(src_col).alias("d"))
        )
        .localCheckpoint()
    )
    deg = und.groupBy(F.col("s").alias("node")).agg(
        F.count("*").alias("degree")
    )
    n_nodes = deg.count()
    if n_nodes == 0:
        return deg.withColumn("pagerank", F.lit(0.0)).limit(0)
    n_lit = F.lit(float(n_nodes))
    teleport = (F.lit(1.0) - F.lit(damping)) / n_lit
    # quantize, not F.round (r10 VERDICT #2): every pinned value in the
    # trajectory is a rational (1/n, pr/degree with pr itself a 12-dp
    # rational) — a degree of 2 with an odd scaled numerator lands the
    # quotient EXACTLY on a 13-digit half-way point, where Spark and
    # DuckDB round() disagree; the FLOOR form is IEEE-pinned on both.
    state = deg.select(
        "node",
        "degree",
        quantize(F.lit(1.0) / n_lit, round_digits).alias("pr"),
    ).localCheckpoint()
    for _ in range(n_iter):
        msg = und.join(
            state.withColumnRenamed("node", "s"), "s"
        ).select(
            F.col("d").alias("node"),
            quantize(
                F.col("pr") / F.col("degree"), round_digits
            ).alias("m"),
        )
        pr = msg.groupBy("node").agg(
            quantize(
                teleport
                + F.lit(damping)
                * F.sum(F.col("m").cast("decimal(38,12)")).cast("double"),
                round_digits,
            ).alias("pr")
        )
        state = deg.join(pr, "node").localCheckpoint()
    return state.select("node", "degree", F.col("pr").alias("pagerank"))
