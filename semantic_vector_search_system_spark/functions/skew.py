"""Skew mitigation utilities.

AQE (enabled in session.py) already splits skewed *join* partitions at
runtime; these helpers cover the cases AQE can't rewrite:

* :func:`salted_aggregate` — two-phase aggregation for heavy-hitter group
  keys: pre-aggregate on (key, salt) so no single reducer receives a whole
  hot key, then merge the partials. Correct only for algebraic aggregates
  (sum/count/min/max — exactly what a merge function can combine).
* :func:`salt_column` — deterministic salt derived from stable row content,
  NOT rand(): re-runs and retried tasks produce identical salts, so results
  are reproducible (a failed-stage retry with rand() salts would not be).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hashing import stable_hash64


def salt_column(unique_col: Column | str, buckets: int) -> Column:
    """Deterministic salt in [0, buckets) from a (unique-ish) column."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(stable_hash64(c.cast("string")), F.lit(buckets))


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    salt_from: str,
    aggs: dict[str, tuple[str, str]],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed keys.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on (keys..., salt) — the hot
    key's rows spread over ``buckets`` reducers; phase 2 merges partials on
    the true keys (sum/sum-of-counts/min/max are self-merging).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    phase1_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", salt_column(salt_from, buckets))
    p1 = salted.groupBy(*key_cols, "__salt").agg(
        *[phase1_fn[fn](col).alias(out) for out, (col, fn) in aggs.items()]
    )
    return p1.groupBy(*key_cols).agg(
        *[merge_fn[fn](out).alias(out) for out, (col, fn) in aggs.items()]
    )
