"""Deterministic Lloyd k-means (operators/clustering.py): numpy-oracle
trajectory parity, expr/fast bitwise agreement, empty-cluster carry,
partitioning invariance, and the final-centroid reshape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.clustering import (
    kmeans_final_centroids,
    kmeans_lloyd,
)


def _emb(spark, vecs, n_parts=None):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df.repartition(n_parts) if n_parts else df


def _py_lloyd(vecs, k, n_iter, round_digits=6):
    """Reference Lloyd with the operator's exact rules: left-assoc
    distance folds, ties to the smaller cent_id, mean = exact
    12-decimal-quantized component sum / count, rounded; empty clusters
    carry forward and emit nothing."""
    from decimal import Decimal, ROUND_HALF_UP

    V = [list(map(float, v)) for v in vecs]
    cents = {cid: list(V[cid]) for cid in range(k)}
    out = []
    for it in range(1, n_iter + 1):
        assign = {}
        for i, v in enumerate(V):
            best = None
            for cid in sorted(cents):
                d = 0.0
                first = True
                for x, c in zip(v, cents[cid]):
                    t = (x - c) * (x - c)
                    d = t if first else d + t
                    first = False
                if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                    best = (d, cid)
            assign.setdefault(best[1], []).append(i)
        nxt = dict(cents)
        for cid, members in assign.items():
            dim = len(V[0])
            cv = []
            for j in range(dim):
                s = sum(
                    (
                        Decimal(V[i][j]).quantize(
                            Decimal("1e-12"), rounding=ROUND_HALF_UP
                        )
                        for i in members
                    ),
                    Decimal(0),
                )
                m = round(float(s) / len(members), 6)
                cv.append(m)
                out.append((it, cid, j, m, len(members)))
            nxt[cid] = cv
        cents = nxt
    return sorted(out)


def test_trajectory_matches_python_oracle(spark):
    rng = np.random.default_rng(11)
    vecs = np.round(rng.normal(size=(40, 5)), 3)
    got = sorted(
        (r["iter"], r["cent_id"], r["idx"], r["centroid_val"], r["n_members"])
        for r in kmeans_lloyd(_emb(spark, vecs), k=3, n_iter=3).collect()
    )
    assert got == _py_lloyd(vecs, k=3, n_iter=3)


def test_expr_and_fast_strategies_bitwise_identical(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(120, 16))
    a = sorted(map(tuple, kmeans_lloyd(_emb(spark, vecs), 4, 3).collect()))
    b = sorted(
        map(tuple, kmeans_lloyd(_emb(spark, vecs), 4, 3, strategy="fast").collect())
    )
    assert a == b  # bitwise: same rounded centroids AND member counts


def test_empty_cluster_carries_forward_and_can_repopulate(spark):
    # c0=(0,0) and c1=(0,0) start identical: every near-zero point ties
    # to the SMALLER cid, so c1 is empty at iter 1 and carries forward.
    vecs = [[0.0, 0.0], [0.0, 0.0], [10.0, 10.0],
            [0.1, 0.0], [0.0, 0.2], [9.8, 10.1], [10.2, 9.9]]
    traj = kmeans_lloyd(_emb(spark, vecs), k=3, n_iter=2).collect()
    by_iter_cent = {}
    for r in traj:
        by_iter_cent.setdefault((r["iter"], r["cent_id"]), []).append(r)
    assert (1, 0) in by_iter_cent and (1, 2) in by_iter_cent
    assert (1, 1) not in by_iter_cent  # empty: emits nothing
    # cluster 0 holds the 4 near-zero points, cluster 2 the 3 far ones
    assert by_iter_cent[(1, 0)][0]["n_members"] == 4
    assert by_iter_cent[(1, 2)][0]["n_members"] == 3
    # iter 2: c0 moved to the near-zero mean, so the two EXACT (0,0)
    # points are now closer to the carried-forward c1 at (0,0) — the
    # empty cluster repopulates from its carried position
    assert by_iter_cent[(2, 1)][0]["n_members"] == 2
    assert by_iter_cent[(2, 0)][0]["n_members"] == 2


def test_partitioning_invariance(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(60, 8))
    a = sorted(map(tuple, kmeans_lloyd(_emb(spark, vecs, 1), 4, 2).collect()))
    b = sorted(map(tuple, kmeans_lloyd(_emb(spark, vecs, 7), 4, 2).collect()))
    assert a == b


def test_final_centroids_reshape(spark):
    vecs = [[0.0, 0.0], [4.0, 4.0], [0.2, 0.2], [3.8, 3.8]]
    traj = kmeans_lloyd(_emb(spark, vecs), k=2, n_iter=2)
    cents = {r["cent_id"]: r["cvec"] for r in kmeans_final_centroids(traj).collect()}
    assert cents[0] == [0.1, 0.1] and cents[1] == [3.9, 3.9]


def test_validation(spark):
    df = _emb(spark, [[0.0, 1.0]])
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=0, n_iter=1)
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=1, n_iter=1, strategy="nope")
    with pytest.raises(ValueError):
        kmeans_lloyd(df, k=5, n_iter=1)  # fewer rows than k


def test_prototype_sample_central_and_far(spark):
    """Two well-separated blobs: central keeps each blob's innermost
    points, far keeps its outliers; the two selections are disjoint at
    per_cluster < blob size and union to the blob under equality."""
    from semantic_vector_search_system_spark.operators.clustering import (
        prototype_sample,
    )

    blob_a = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [2.0, 2.0]]   # 3 tight + outlier
    blob_b = [[10.0, 10.0], [10.1, 10.0], [10.0, 10.1], [8.0, 8.0]]
    emb = _emb(spark, blob_a + blob_b)
    central = prototype_sample(emb, k=2, n_iter=2, per_cluster=2, keep="central")
    far = prototype_sample(emb, k=2, n_iter=2, per_cluster=1, keep="far")
    c_ids = {r["vec_id"] for r in central.collect()}
    f_ids = {r["vec_id"] for r in far.collect()}
    assert f_ids == {3, 7}          # the planted outliers
    assert c_ids.isdisjoint(f_ids)  # prototypes exclude outliers
    assert c_ids <= {0, 1, 2, 4, 5, 6}
    # ranks are 1..per_cluster within each cluster, dist ascending
    rows = sorted(central.collect(), key=lambda r: (r["cent_id"], r["rank"]))
    for a, b in zip(rows, rows[1:]):
        if a["cent_id"] == b["cent_id"]:
            assert a["rank"] + 1 == b["rank"] and a["dist"] <= b["dist"]


def test_prototype_sample_matches_python_reference(spark):
    """End-to-end vs a python replay: Lloyd fit (shared reference),
    unrounded argmin assignment, round-6 rank with vec_id ties."""
    from semantic_vector_search_system_spark.operators.clustering import (
        prototype_sample,
    )

    rng = np.random.default_rng(5)
    vecs = np.round(rng.normal(size=(30, 4)), 3)
    k, n_iter, m = 3, 2, 4
    # reference centroids from _py_lloyd's final iteration
    traj = _py_lloyd(vecs, k, n_iter)
    cents = {}
    for it, cid, idx, val, _ in traj:
        if it == n_iter:
            cents.setdefault(cid, {})[idx] = val
    cdict = {cid: [by[i] for i in sorted(by)] for cid, by in cents.items()}
    for cid in range(k):
        cdict.setdefault(cid, list(map(float, vecs[cid])))
    ref = []
    for i, v in enumerate(vecs):
        best = None
        for cid in sorted(cdict):
            d, first = 0.0, True
            for x, c in zip(v, cdict[cid]):
                t = (float(x) - c) * (float(x) - c)
                d = t if first else d + t
                first = False
            if best is None or d < best[0] or (d == best[0] and cid < best[1]):
                best = (d, cid)
        ref.append((best[1], i, round(best[0], 6)))
    out = []
    for cid in sorted({c for c, _, _ in ref}):
        members = sorted(
            [(d, i) for c, i, d in ref if c == cid]
        )[:m]
        out += [(cid, i, r + 1, d) for r, (d, i) in enumerate(members)]
    got = sorted(
        (r["cent_id"], r["vec_id"], r["rank"], r["dist"])
        for r in prototype_sample(_emb(spark, vecs), k, n_iter, m).collect()
    )
    assert got == sorted(out)
