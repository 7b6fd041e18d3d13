"""Mergeable distinct-count sketches with SET OPERATIONS (KMV / theta).

``sketch_stats`` (plans/catalog.py) introduced the deterministic KMV
bottom-k distinct estimator [Bar-Yossef et al. 2002]. This module makes
the sketch a first-class RELATION — ``(group, hashes, theta, n_seen)`` —
so sketches can be stored, merged across days/partitions, and combined
with the theta-sketch set algebra [Dasgupta et al. 2016]:

* every retained hash is ``< theta`` (theta = 2^60 while the group is
  exact, i.e. fewer than k distinct values seen; else the k-th smallest
  hash);
* union estimate   = |S_A ∪ S_B below θ| · 2^60 / θ,  θ = min(θ_A, θ_B);
* intersect estimate = |S_A ∩ S_B below θ| · 2^60 / θ;
* both collapse to EXACT counts while both sides are exact (θ = 2^60).

Everything is integer/IEEE arithmetic over ``stable_hash64`` — no
engine-specific register layouts (HLL/theta images differ per engine),
so a DuckDB oracle replays estimates bit-for-bit.

Scale: a sketch row is O(k) longs per group — the shuffle for
``kmv_group_sketch`` moves distinct (group, hash) pairs once (map-side
combined distinct), and every downstream union/intersection runs on
sketch rows, never the data. The per-group bottom-k rank is a window
over already-distinct hashes; at extreme group cardinality swap it for
the bounded-heap partial aggregate (jvm TopKAggregator shape) — the
estimator is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.quantize import quantize

from ..functions.hashing import HASH_BITS, stable_hash64

#: theta while a group is still exact: the whole 60-bit hash space.
EXACT_THETA = 1 << HASH_BITS


def kmv_group_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV sketch: ``(group, hashes array<long> — the up-to-k
    smallest distinct value hashes, theta long, n_seen long)``.

    ``n_seen`` is the RETAINED-ROW count, capped at ``k`` (the bottom-k
    rows that survived the rank filter) — NOT the total number of
    distinct values the group contains (r8 ADVICE: the name left that
    ambiguous).  While the group is exact (``n_seen < k``, θ = 2^60)
    the two coincide; in estimate mode use ``union_est``/the
    ``(k-1)/h_k`` estimator for cardinality, never ``n_seen``."""
    if k < 2:
        raise ValueError("k must be >= 2")
    dh = df.select(
        F.col(group_col),
        stable_hash64(F.col(value_col).cast("string")).alias("h"),
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    bk = dh.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    agg = bk.groupBy(group_col).agg(
        F.sort_array(F.collect_list("h")).alias("hashes"),
        F.count("*").alias("n_seen"),
        F.max("h").alias("_kth"),
    )
    theta = F.when(
        F.col("n_seen") < k, F.lit(EXACT_THETA).cast("long")
    ).otherwise(F.col("_kth"))
    return agg.select(
        group_col,
        # retained set = hashes strictly below theta (in estimate mode
        # the k-th value IS theta and drops out, leaving k-1 — the
        # classic (k-1)/h_k estimator's retained set)
        F.filter("hashes", lambda x: x < theta).alias("hashes"),
        theta.alias("theta"),
        "n_seen",
    )


def _estimate(n_below: Column, theta: Column) -> Column:
    """``floor(n · (2^60 / θ))`` — written in this exact IEEE op order on
    both engines; equals ``n`` exactly when θ = 2^60."""
    return F.floor(
        n_below.cast("double")
        * (F.lit(float(EXACT_THETA)) / theta.cast("double"))
    ).cast("long")


def kmv_pair_ops(
    sketches: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """Theta set algebra between two groups' sketches: one row
    ``(n_union_retained, n_intersect_retained, theta_u, union_est,
    intersect_est, jaccard_est)``. Runs entirely on the two sketch rows
    (a broadcast-trivial 1x1 join); the base data is never touched.

    Both group labels must resolve to EXACTLY ONE sketch row — a typo'd
    label previously returned zero rows, indistinguishable from a
    legitimate empty-set result (r8 ADVICE); now it raises."""
    a = sketches.filter(F.col(group_col) == group_a).select(
        F.col("hashes").alias("ha"), F.col("theta").alias("ta")
    )
    b = sketches.filter(F.col(group_col) == group_b).select(
        F.col("hashes").alias("hb"), F.col("theta").alias("tb")
    )
    # cheap: sketch relations are O(groups) rows by construction
    for label, side in ((group_a, a), (group_b, b)):
        n = side.count()
        if n != 1:
            raise ValueError(
                f"kmv_pair_ops: group {label!r} resolves to {n} sketch "
                f"rows in {group_col!r} (expected exactly 1) — check the "
                "label and that kmv_group_sketch grouped on this column"
            )
    j = a.crossJoin(F.broadcast(b))
    theta_u = F.least("ta", "tb")
    below = lambda c: F.filter(c, lambda x: x < theta_u)  # noqa: E731
    nu = F.size(F.array_distinct(F.concat(below("ha"), below("hb"))))
    ni = F.size(below(F.array_intersect("ha", "hb")))
    return j.select(
        nu.alias("n_union_retained"),
        ni.alias("n_intersect_retained"),
        theta_u.alias("theta_u"),
        _estimate(nu, theta_u).alias("union_est"),
        _estimate(ni, theta_u).alias("intersect_est"),
        # quantize, not F.round (r10 VERDICT #2): ni/nu is a rational of
        # integer retained-counts — the cross-engine .5-boundary class.
        F.when(nu > 0, quantize(ni.cast("double") / nu.cast("double"), 6))
        .otherwise(F.lit(0.0))
        .alias("jaccard_est"),
    )


def kmv_merge(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """Merge ALL groups' sketches into one (the union sketch — e.g. fold
    per-day sketches into a month): θ = min over groups, pool retained
    hashes below θ, keep the k smallest. Returns one row ``(hashes,
    theta, n_seen)``; mergeability is what lets 100 TB profiling keep
    O(k) state per dimension instead of re-scanning."""
    tmin = sketches.agg(F.min("theta").alias("t")).collect()[0]["t"]
    if tmin is None:  # no sketches at all: empty exact sketch
        tmin = EXACT_THETA
    kept = (
        sketches.select(F.explode("hashes").alias("h"))
        .filter(F.col("h") < F.lit(tmin))
        .distinct()
        .orderBy("h")
        .limit(k)
    )
    agg = kept.agg(
        F.sort_array(F.collect_list("h")).alias("hashes"),
        F.count("*").alias("n_seen"),
        F.max("h").alias("_kth"),
    )
    theta = F.when(
        F.col("n_seen") < k, F.lit(tmin).cast("long")
    ).otherwise(F.col("_kth"))
    return agg.select(
        F.filter("hashes", lambda x: x < theta).alias("hashes"),
        theta.alias("theta"),
        "n_seen",
    )
