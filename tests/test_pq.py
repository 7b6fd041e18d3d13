"""Unit tests for operators/pq.py (product quantization).

The catalog oracle (ann_pq_topk) pins the expression form relationally;
these tests pin (a) expression-vs-Arrow-kernel parity, (b) ADC math
against a transparent numpy oracle, (c) that k-means codebooks beat the
zero-cost first-K codebooks on reconstruction error, and (d) a recall
floor of PQ top-k against exact brute force at the test geometry.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.pq import (
    pq_adc_topk,
    pq_adc_topk_fast,
    pq_codebook_first_k,
    pq_encode,
    pq_encode_fast,
    pq_train_codebooks,
)

SF_DIR = "/root/testdata/sf0.001"
M, K, DIM = 4, 16, 64


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )


@pytest.fixture(scope="module")
def X(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def _books_from_first_k(X):
    return np.stack(
        [X[:K, j * (DIM // M) : (j + 1) * (DIM // M)] for j in range(M)]
    )


def test_encode_fast_matches_expression_form(spark, emb, X):
    cb = pq_codebook_first_k(emb, m=M, k_codes=K)
    expr_codes = {
        (r["vec_id"], r["sub"]): r["code"] for r in pq_encode(emb, cb).collect()
    }
    fast = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode_fast(emb, _books_from_first_k(X)).collect()
    }
    assert len(fast) == len(X)
    for vid, codes in fast.items():
        for j in range(M):
            assert expr_codes[(vid, j)] == codes[j], (vid, j)


def test_adc_matches_numpy_oracle(spark, emb, X):
    books = _books_from_first_k(X)
    d = DIM // M
    # numpy oracle: encode + ADC, exhaustive
    codes = np.empty((len(X), M), dtype=np.int64)
    for j in range(M):
        S = X[:, j * d : (j + 1) * d]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)
    qids = np.arange(100, 105)
    Q = X[qids]
    got = pq_adc_topk_fast(Q, qids, pq_encode_fast(emb, books), books, k=5)
    got_rows = {(r["qid"], r["rank"]): (r["docid"], r["adist"]) for r in got.collect()}
    for qi, qid in enumerate(qids):
        adist = np.zeros(len(X))
        for j in range(M):
            lut = ((Q[qi, None, j * d : (j + 1) * d] - books[j]) ** 2).sum(axis=1)
            adist += lut[codes[:, j]]
        order = np.lexsort((np.arange(len(X)), adist))[:5]
        for rank, docid in enumerate(order, start=1):
            gd, ga = got_rows[(qid, rank)]
            assert gd == docid, (qid, rank)
            assert ga == pytest.approx(adist[docid], rel=1e-9)


def test_kmeans_codebooks_beat_first_k_on_reconstruction(spark, emb, X):
    books_fk = _books_from_first_k(X)
    books_km = pq_train_codebooks(emb, m=M, k_codes=K, seed=7, max_iter=10)
    d = DIM // M

    def recon_err(books):
        err = 0.0
        for j in range(M):
            S = X[:, j * d : (j + 1) * d]
            d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            err += d2.min(axis=1).sum()
        return err

    assert recon_err(books_km) < recon_err(books_fk) * 0.9


def test_pq_recall_floor_vs_exact(spark, emb, X):
    """PQ top-10 recall vs exact L2 brute force with k-means codebooks at
    the 500x64 test geometry — floor set well under the measured value so
    BLAS/partitioning jitter can't flake it, but high enough that a
    broken LUT/argmin (recall ~ k/N = 0.02) fails loudly.

    Geometry m=8 (8 bytes/vector, 32x compression): measured 0.34 on
    these near-uniform synthetic vectors (m=4 0.255, m=16 0.495 — the
    standard compression/recall dial; real text embeddings cluster and
    recall correspondingly higher, and production serving pairs the PQ
    shortlist with an exact rerank as in quantized_topk_rerank)."""
    books = pq_train_codebooks(emb, m=8, k_codes=K, seed=7, max_iter=10)
    qids = np.arange(100, 120)
    Q = X[qids]
    got = pq_adc_topk_fast(Q, qids, pq_encode_fast(emb, books), books, k=10)
    approx = {}
    for r in got.collect():
        approx.setdefault(r["qid"], set()).add(r["docid"])
    recalls = []
    for qi, qid in enumerate(qids):
        d2 = ((X - Q[qi][None, :]) ** 2).sum(axis=1)
        exact = set(np.lexsort((np.arange(len(X)), d2))[:10])
        recalls.append(len(exact & approx[qid]) / 10.0)
    mean = sum(recalls) / len(recalls)
    assert mean >= 0.2, f"mean PQ recall@10 {mean} below floor"


def test_adc_expression_rank_consistency(spark, emb):
    """Expression-form ADC (the oracle path) agrees with the fast path on
    ranks for the deterministic codebook."""
    cb = pq_codebook_first_k(emb, m=M, k_codes=K)
    codes = pq_encode(emb, cb)
    queries = emb.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 105)).select(
        F.col("vec_id").alias("qid"), "embedding"
    )
    expr = {
        (r["qid"], r["rank"]): r["docid"]
        for r in pq_adc_topk(queries, codes, cb, k=5).collect()
    }
    rows = emb.orderBy("vec_id").collect()
    Xl = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    books = _books_from_first_k(Xl)
    qids = np.arange(100, 105)
    fast = {
        (r["qid"], r["rank"]): r["docid"]
        for r in pq_adc_topk_fast(
            Xl[qids], qids, pq_encode_fast(emb, books), books, k=5
        ).collect()
    }
    assert expr == fast


# ---------------------------------------------------------------------------
# IVF + PQ (residual ADC)
# ---------------------------------------------------------------------------

def test_ivfpq_exact_on_lattice(spark):
    """Vectors constructed EXACTLY as centroid + codeword (zero residual
    quantization error) must be served back with exact distances: IVFPQ
    top-k == exact L2 top-k for queries probing the right list."""
    from semantic_vector_search_system_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
    )

    rng = np.random.default_rng(3)
    m, k_codes, d = 2, 4, 4  # dim 8
    C = np.array([[5.0] * 8, [-5.0] * 8])  # two far-apart lists
    cent_ids = np.array([0, 1])
    books = rng.normal(size=(m, k_codes, d)) * 0.1
    # 32 docs: centroid[l] + (codeword j1, codeword j2)
    rows = []
    vecs = []
    i = 0
    for l in range(2):
        for c1 in range(k_codes):
            for c2 in range(k_codes):
                v = C[l].copy()
                v[:4] += books[0][c1]
                v[4:] += books[1][c2]
                rows.append((i, [float(x) for x in v]))
                vecs.append(v)
                i += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    V = np.array(vecs)
    coded = ivfpq_encode(emb, cent_ids, C, books)
    qids = np.array([0, 20])
    got = {
        (r["qid"], r["rank"]): (r["docid"], r["adist"])
        for r in ivfpq_topk(
            V[qids], qids, coded, cent_ids, C, books, k=5, nprobe=1
        ).collect()
    }
    for qid in qids:
        # exact L2 within the query's own lattice half (its probed list)
        half = range(0, 16) if qid < 16 else range(16, 32)
        d2 = {j: ((V[j] - V[qid]) ** 2).sum() for j in half}
        order = sorted(d2, key=lambda j: (d2[j], j))[:5]
        for rank, j in enumerate(order, start=1):
            gd, ga = got[(qid, rank)]
            assert gd == j, (qid, rank)
            assert ga == pytest.approx(d2[j], abs=1e-9)


def test_ivfpq_recall_monotone_and_floor(spark, emb, X):
    """Testdata geometry (500x64, 8 lists): recall@10 vs exact rises with
    nprobe and clears a loose floor at nprobe=8 (all lists scanned).

    Measured 0.175 (nprobe=1) / 0.21 (nprobe=8) — BELOW raw-vector PQ's
    0.34 at the same bit budget, and that is the honest property of THIS
    data: the synthetic embeddings are near-uniform on the sphere, so
    subtracting a nearly-orthogonal centroid INCREASES residual variance
    (||v - c||^2 ~ ||v||^2 + ||c||^2) and residuals quantize worse. On
    clustered real embeddings (the IVFADC operating assumption, Jégou
    2011 §IV) centroids absorb most of the norm and residual PQ wins;
    the operator's correctness is pinned exactly by the lattice test
    above. Floor 0.12 = 6x the broken-ADC level (~k/N = 0.02)."""
    from semantic_vector_search_system_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    cent_ids = np.arange(8)
    C = X[:8].copy()
    books = ivfpq_train(emb, cent_ids, C, m=8, k_codes=K, seed=7)
    coded = ivfpq_encode(emb, cent_ids, C, books).localCheckpoint()
    qids = np.arange(100, 120)
    recs = {}
    for nprobe in (1, 8):
        got = {}
        for r in ivfpq_topk(
            X[qids], qids, coded, cent_ids, C, books, k=10, nprobe=nprobe
        ).collect():
            got.setdefault(r["qid"], set()).add(r["docid"])
        vals = []
        for qi, qid in enumerate(qids):
            d2 = ((X - X[qid][None, :]) ** 2).sum(axis=1)
            exact = set(np.lexsort((np.arange(len(X)), d2))[:10])
            vals.append(len(exact & got.get(qid, set())) / 10.0)
        recs[nprobe] = sum(vals) / len(vals)
    assert recs[8] >= recs[1]
    assert recs[8] >= 0.12, recs


def test_ivfpq_serving_scan_is_partition_pruned(spark, emb, X, tmp_path):
    """The 100 TB property of IVFPQ serving: the code-table scan carries
    PartitionFilters on cent_id (only probed lists are read) and the doc
    side never shuffles — the only exchange is the bounded top-k merge."""
    from semantic_vector_search_system_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
        ivfpq_train,
    )

    cent_ids = np.arange(8)
    C = X[:8].copy()
    books = ivfpq_train(emb, cent_ids, C, m=8, k_codes=K, seed=7)
    path = str(tmp_path / "codes")
    ivfpq_encode(emb, cent_ids, C, books).write.partitionBy(
        "cent_id"
    ).parquet(path)
    coded = spark.read.parquet(path)
    qids = np.arange(100, 102)
    plan = (
        ivfpq_topk(X[qids], qids, coded, cent_ids, C, books, k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cent_id" in m.group(1), plan[:1500]
    # exactly one exchange: the final rank window over bounded partials
    assert plan.count("Exchange") - plan.count("ReusedExchange") <= 1, plan[:1500]


def test_ivfpq_expr_matches_numpy_replay(spark, emb, X):
    """The expression-form IVF+PQ pipeline (ivfpq_topk_expr — the
    ann_ivfpq_topk oracle face) against a transparent numpy replay of
    every stage: cosine assignment (ties to smaller cent_id), residuals,
    first-16-residuals codebook, per-subspace argmin encode (ties to
    smaller code), nprobe=2 probed ADC, (adist asc, docid asc) ranking."""
    from semantic_vector_search_system_spark.operators.pq import (
        ivfpq_topk_expr,
    )

    n_cents, nprobe, k = 8, 2, 5
    C = X[:n_cents]

    def normalize(M):
        n = np.linalg.norm(M, axis=1, keepdims=True)
        return np.divide(M, n, out=np.zeros_like(M), where=n > 0)

    S = normalize(X) @ normalize(C).T
    # argmax with ties to the smaller cent_id = plain argmax (first max)
    asg = S.argmax(axis=1)
    R = X - C[asg]
    d = DIM // M
    books = np.stack(
        [R[:K, j * d : (j + 1) * d] for j in range(M)]
    )  # first-16 residuals per subspace
    codes = np.empty((len(X), M), dtype=np.int64)
    for j in range(M):
        D2 = ((R[:, None, j * d : (j + 1) * d] - books[j][None]) ** 2).sum(
            axis=2
        )
        codes[:, j] = D2.argmin(axis=1)  # first min = smaller code on tie

    qids = np.arange(100, 105)
    expect = {}
    for qi in qids:
        probe = np.argsort(-S[qi], kind="stable")[:nprobe]
        cand = [i for i in range(len(X)) if asg[i] in probe]
        adist = {}
        for i in cand:
            r = X[qi] - C[asg[i]]
            a = 0.0
            for j in range(M):
                diff = r[j * d : (j + 1) * d] - books[j][codes[i, j]]
                a += float((diff**2).sum())
            adist[i] = round(a, 4)
        top = sorted(cand, key=lambda i: (adist[i], i))[:k]
        expect.update(
            {(int(qi), int(i)): (rk + 1, adist[i]) for rk, i in enumerate(top)}
        )

    cents = spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(n_cents)],
        "cent_id long, cvec array<double>",
    )
    queries = emb.filter(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 105)
    ).select(F.col("vec_id").alias("qid"), "embedding")
    got = {
        (r["qid"], r["docid"]): (r["rank"], r["adist"])
        for r in ivfpq_topk_expr(
            emb, cents, queries, k=k, nprobe=nprobe, m=M, k_codes=K
        ).collect()
    }
    assert set(got) == set(expect)
    for key in expect:
        rk_e, a_e = expect[key]
        rk_g, a_g = got[key]
        assert rk_g == rk_e, (key, got[key], expect[key])
        assert a_g == pytest.approx(a_e, abs=2e-4), key
