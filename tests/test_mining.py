"""Unit tests for operators/mining.py (margin-based bitext mining).

The catalog oracle (bitext_margin_pairs) pins the expression form
relationally; these tests pin (a) the full pipeline against a
transparent numpy replay, (b) parity between the cross-join face and the
scale face fed with pre-retrieved knn relations, and (c) hub-vector
behavior — the margin demotes a vector that is everyone's nearest
neighbor, which raw cosine alone would over-pair.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.mining import (
    margin_knn_pairs,
    margin_knn_pairs_from_knn,
)


def _mk_sets(spark, X, Y):
    x = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(len(X))],
        "xid long, xv array<double>",
    )
    y = spark.createDataFrame(
        [(j, [float(v) for v in Y[j]]) for j in range(len(Y))],
        "yid long, yv array<double>",
    )
    return x, y


def _py_margin(X, Y, k, threshold):
    """Transparent replay: cosine, both knn lists, round-12 means,
    margin argmax per x."""
    def norm(M):
        n = np.linalg.norm(M, axis=1, keepdims=True)
        return np.divide(M, n, out=np.zeros_like(M), where=n > 0)

    C = norm(np.asarray(X, float)) @ norm(np.asarray(Y, float)).T
    nx, ny = C.shape
    fwd = {
        i: sorted(range(ny), key=lambda j: (-C[i, j], j))[:k] for i in range(nx)
    }
    bwd = {
        j: sorted(range(nx), key=lambda i: (-C[i, j], i))[:k] for j in range(ny)
    }
    mx = {i: sum(round(C[i, j], 12) for j in fwd[i]) / len(fwd[i]) for i in fwd}
    my = {j: sum(round(C[i, j], 12) for i in bwd[j]) / len(bwd[j]) for j in bwd}
    out = {}
    for i in range(nx):
        scored = [
            (j, round(C[i, j], 12) / ((mx[i] + my[j]) / 2.0)) for j in fwd[i]
        ]
        j, mg = min(scored, key=lambda t: (-t[1], t[0]))
        if mg >= threshold:
            out[i] = (j, round(mg, 6))
    return out


def test_margin_matches_numpy_replay(spark):
    rng = np.random.default_rng(5)
    X = rng.normal(size=(30, 12))
    Y = rng.normal(size=(40, 12))
    # plant true pairs: y_j near x_i for a few i
    for i in (2, 7, 11):
        Y[i] = X[i] + rng.normal(scale=0.05, size=12)
    x, y = _mk_sets(spark, X, Y)
    got = {
        r["xid"]: (r["yid"], r["margin"])
        for r in margin_knn_pairs(x, y, k=4, threshold=1.0).collect()
    }
    want = _py_margin(X, Y, 4, 1.0)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], i
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-6), i
    # planted pairs surface as each x's best partner
    for i in (2, 7, 11):
        assert got[i][0] == i


def test_margin_scale_face_matches_cross_join_face(spark):
    """margin_knn_pairs_from_knn fed the SAME knn lists (here: exact
    brute-force rankings) must reproduce the cross-join face exactly —
    the contract that lets the 100 TB miner swap in ANN retrieval."""
    from pyspark.sql import Window

    from semantic_vector_search_system_spark.functions.vectors import (
        cosine_similarity,
    )

    rng = np.random.default_rng(9)
    X, Y = rng.normal(size=(25, 8)), rng.normal(size=(35, 8))
    x, y = _mk_sets(spark, X, Y)
    p = (
        x.select("xid", F.col("xv").cast("array<double>").alias("_xv"))
        .crossJoin(y.select("yid", F.col("yv").cast("array<double>").alias("_yv")))
        .select("xid", "yid", cosine_similarity("_xv", "_yv").alias("score"))
    )
    k = 3
    wf = Window.partitionBy("xid").orderBy(F.desc("score"), F.asc("yid"))
    wb = Window.partitionBy("yid").orderBy(F.desc("score"), F.asc("xid"))
    fwd = p.withColumn("r", F.row_number().over(wf)).filter(F.col("r") <= k)
    bwd = p.withColumn("r", F.row_number().over(wb)).filter(F.col("r") <= k)
    a = sorted(
        map(tuple, margin_knn_pairs(x, y, k=k, threshold=0.0).collect())
    )
    b = sorted(
        map(
            tuple,
            margin_knn_pairs_from_knn(
                fwd.select("xid", "yid", "score"),
                bwd.select("xid", "yid", "score"),
                k=k,
                threshold=0.0,
            ).collect(),
        )
    )
    assert a == b and len(a) == 25


def test_margin_demotes_hub_vector(spark):
    """The operator's reason to exist: a hub y (high cosine to EVERY x)
    must lose to a genuine match under the margin even when its raw
    cosine ties or beats the match — the hub's backward neighborhood
    mean is itself high, deflating its margins."""
    dim = 6
    hub = np.ones(dim)
    X = np.vstack(
        [np.eye(dim)[i] * 0.2 + hub * 0.8 for i in range(4)]
    )  # every x is close to the hub direction
    Y = np.vstack([hub, X[2] + 0.01])  # y0 = hub; y1 = near-exact match of x2
    x, y = _mk_sets(spark, X, Y)
    got = {
        r["xid"]: r["yid"]
        for r in margin_knn_pairs(x, y, k=2, threshold=0.0).collect()
    }
    assert got[2] == 1  # x2 pairs with its true match, not the hub


def test_hard_negative_mine_excludes_positives_exactly(spark):
    """Planted geometry: for query q aligned with axis 0, docs sorted by
    cosine are d0 > d1 > d2 > d3 > d4.  With {d0, d2} positive, the
    top-3 negatives must be (d1, d3, d4) in that order — the positives
    are skipped, not merely filtered after a too-small pool."""
    from semantic_vector_search_system_spark.operators.mining import (
        hard_negative_mine,
    )

    q = spark.createDataFrame([(0, [1.0, 0.0])], "qid long, qvec array<double>")
    docs = spark.createDataFrame(
        [
            (10, [1.0, 0.0]),     # cos 1.0    POSITIVE
            (11, [0.9, 0.1]),
            (12, [0.8, 0.2]),     #            POSITIVE
            (13, [0.7, 0.3]),
            (14, [0.1, 0.9]),
        ],
        "docid long, vec array<double>",
    )
    pos = spark.createDataFrame([(0, 10), (0, 12)], "qid long, docid long")
    out = hard_negative_mine(q, docs, pos, k=3).orderBy("neg_rank").collect()
    assert [(r["docid"], r["neg_rank"]) for r in out] == [
        (11, 1), (13, 2), (14, 3)
    ]
    # scores strictly decreasing along neg_rank
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_hard_negative_mine_pool_extra_defaults_to_max_positives(spark):
    """Two queries with 0 and 3 positives: the default pool must be big
    enough that the 3-positive query still yields k full negatives."""
    from semantic_vector_search_system_spark.operators.mining import (
        hard_negative_mine,
    )

    q = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "qid long, qvec array<double>"
    )
    docs = spark.createDataFrame(
        [(i, [1.0 - i * 0.1, i * 0.1]) for i in range(8)],
        "docid long, vec array<double>",
    )
    pos = spark.createDataFrame(
        [(1, 7), (1, 6), (1, 5)], "qid long, docid long"
    )
    out = hard_negative_mine(q, docs, pos, k=2)
    rows = {(r["qid"], r["neg_rank"]): r["docid"] for r in out.collect()}
    # q1 (axis 1) ranks docs by ascending alignment with axis 1: its top
    # scorers 7, 6, 5 are ALL positive, so negatives start at doc 4
    assert rows[(1, 1)] == 4 and rows[(1, 2)] == 3
    # q0 has no positives: plain top-2
    assert rows[(0, 1)] == 0 and rows[(0, 2)] == 1
