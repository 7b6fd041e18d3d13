"""Distributed exact global ranking — the scalable replacement for a
single-partition ``Window.orderBy(...)``.

Spark implements an unpartitioned window (``row_number() OVER (ORDER BY
...)``) by sorting EVERYTHING into one partition — one reducer holds the
whole relation, the canonical 100 TB anti-pattern. The classic fix is
two-phase: range-repartition on the order keys (parallel sort), count rows
per physical partition (a tiny driver collect — one long per partition),
then rank = partition prefix-sum offset + local row_number. Every phase is
parallel; driver traffic is O(num_partitions).

``ntile_from_rank`` converts the exact rank into standard SQL NTILE
buckets (first ``total % b`` buckets get the extra row) so quantile
bucketing — CCNet-style head/middle/tail data curation — rides on the
same primitive and matches the engines' NTILE bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_OFF = "__gr_off"


def global_row_number(
    df: DataFrame,
    order_cols: list[Column],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank under the total order ``order_cols``
    (include a unique tie-break column — otherwise ranks of ties are
    partition-placement-dependent like any sort).

    The range-repartitioned relation is pinned with ``localCheckpoint``
    because ``repartitionByRange`` SAMPLES its boundaries: without
    pinning, the per-partition-count job and the ranking job could see
    different partitionings and the offsets would lie. On a cluster,
    prefer a reliable checkpoint for lineage-loss tolerance.
    """
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    parts = (
        df.repartitionByRange(n, *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r[_PID]: r["n"]
        for r in parts.groupBy(_PID).agg(F.count("*").alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    # range partitioning orders partitions by key range, so prefix sums
    # over ascending pid ARE the global offsets.  The lookup is a
    # BROADCAST JOIN against the tiny (pid, offset) relation, not a
    # nested CASE WHEN chain: at the partition counts this primitive is
    # advertised for (thousands+), an O(P)-deep when-chain risks
    # analyzer/codegen stack overflow and pathological compile time
    # (r8 ADVICE) — the join stays flat at any partition count.
    off_df = df.sparkSession.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()],
        f"{_PID} int, {_OFF} long",
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        parts.join(F.broadcast(off_df), _PID, "left")
        .withColumn(
            rank_col,
            (
                F.row_number().over(w)
                + F.coalesce(F.col(_OFF), F.lit(0))
            ).cast("long"),
        )
        .drop(_PID, _OFF)
    )


def ntile_from_rank(rank: Column, total: int, n_buckets: int) -> Column:
    """Standard SQL ``NTILE(n_buckets)`` bucket (1-based) from an exact
    global rank: the first ``total % n_buckets`` buckets hold
    ``ceil(total / n_buckets)`` rows, the rest ``floor(total /
    n_buckets)`` — bit-identical to Spark's and DuckDB's NTILE over the
    same total order."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    q, r = divmod(int(total), n_buckets)
    big = r * (q + 1)  # rows living in the size-(q+1) buckets
    bucket = F.when(
        rank <= F.lit(big), ((rank - 1) / F.lit(q + 1)).cast("long") + 1
    ).otherwise(
        # q == 0 can only happen when total < n_buckets, where EVERY row
        # has rank <= big = total — the otherwise branch never selects a
        # row, but guard the denominator so eager evaluation can't /0
        F.lit(r) + ((rank - F.lit(big) - 1) / F.lit(max(q, 1))).cast("long") + 1
    )
    return bucket.cast("long")
