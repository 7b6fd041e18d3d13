"""Maximal Marginal Relevance result diversification (MMR).

Carbonell & Goldstein 1998: re-rank a retrieval pool so each next pick
maximizes ``lam * rel(q, d) - (1 - lam) * max_{s in selected} sim(d, s)``
— relevant results that are NOT near-copies of what is already shown.
The reference system returns raw cosine top-k (`evaluation/`); result
diversification is the canonical next query-level feature for exactly
the near-duplicate-heavy corpora the dedup stack targets, and it doubles
as search-time dedup when offline dedup hasn't run.

Determinism (catalog-oracle contract): relevance and pairwise
similarities are PINNED left-associative dot-product chains rounded to
12 decimals (the ann_pq/kmeans idiom), ``lam`` defaults to 0.5 (dyadic:
``0.5*a`` and ``a-b`` of identical doubles are IEEE-exact in any
engine), selection ties break on doc id — so the greedy trajectory is
replayable step by step as unrolled SQL CTEs, and any divergence in
pool ranking, marginal computation, or tie handling hash-mismatches.

Scale shape: the pool is a bounded per-query top-``pool_size`` (the knn
stack's job — partial top-k, never a global sort); MMR itself is
O(pool² · k) per query over that BOUNDED pool inside one
``applyInPandas`` group (state = pool_size vectors). The cross-pair
similarity work that makes naive corpus-wide MMR intractable never
touches the corpus.
"""

from __future__ import annotations

import functools
import operator as _op

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot_expr(a: str, b, dim: int) -> F.Column:
    """Left-assoc dot chain between an array column and either another
    array column name or a literal list — mirrors the oracle's SQL ``+``
    chain term-for-term."""
    terms = []
    for i in range(1, dim + 1):
        x = F.element_at(F.col(a), i)
        y = F.element_at(F.col(b), i) if isinstance(b, str) else F.lit(float(b[i - 1]))
        terms.append(x * y)
    return functools.reduce(_op.add, terms)


def mmr_rerank(
    queries: DataFrame,
    docs: DataFrame,
    k: int = 5,
    pool_size: int = 10,
    lam: float = 0.5,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    id_col: str = "docid",
    vec_col: str = "v",
) -> DataFrame:
    """Diversified top-``k`` per query: ``(qid, docid, step, rel)`` with
    ``step`` the greedy selection order (1 = plain argmax relevance) and
    ``rel`` the round-6 display copy of the round-12 relevance dot.

    Pool construction here is the expression-dot ranking over the full
    doc relation (fine for catalog scale; at 100 TB feed the pool from
    the ANN stack and start at the applyInPandas stage). ``lam`` must be
    exactly representable (0.5, 0.25, ...) for the cross-engine
    guarantee; other values still give a deterministic Spark result.
    """
    import math

    import pandas as pd
    from decimal import ROUND_HALF_UP, Decimal

    first = docs.select(vec_col).first()
    if first is None or first[0] is None:
        # r8 ADVICE: an empty docs relation (or a NULL first vector) made
        # first()[0] raise a bare TypeError; fail with the actual contract
        raise ValueError(
            f"mmr_rerank: docs is empty or {vec_col!r} is NULL in the "
            "first row — cannot infer the vector dimension"
        )
    dim = len(first[0])
    d = docs.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_dv")
    )
    q = queries.select(
        F.col(qid_col), F.col(qvec_col).cast("array<double>").alias("_qv")
    )
    scored = q.crossJoin(d).select(
        qid_col,
        id_col,
        "_dv",
        F.round(_dot_expr("_qv", "_dv", dim), 12).alias("rel"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy(qid_col).orderBy(F.col("rel").desc(), F.col(id_col))
    pool = scored.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= pool_size
    )

    q12 = Decimal("1e-12")

    def mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        srt = pdf.sort_values(["rel", id_col], ascending=[False, True])
        cand = [
            (did, float(rel), list(v))
            for did, rel, v in zip(srt[id_col], srt["rel"], srt["_dv"])
        ]
        sel: list[tuple] = []
        while cand and len(sel) < k:
            if not sel:
                best = 0  # argmax rel, ties already id-ordered
            else:
                best_key, best = None, None
                for i, (did, rel, v) in enumerate(cand):
                    msim = None
                    for _, _, sv in sel:
                        s, first = 0.0, True
                        for x, y in zip(v, sv):
                            t = x * y
                            s = t if first else s + t
                            first = False
                        s = float(Decimal(s).quantize(q12, rounding=ROUND_HALF_UP))
                        msim = s if msim is None or s > msim else msim
                    score = lam * rel - (1.0 - lam) * msim
                    key = (-score, did)
                    if best_key is None or key < best_key:
                        best_key, best = key, i
            sel.append(cand.pop(best))
        out = pd.DataFrame(
            {
                qid_col: pdf[qid_col].iloc[0],
                id_col: [s[0] for s in sel],
                "step": [i + 1 for i in range(len(sel))],
                # quantize-6 (FLOOR form, r10 VERDICT #2): mirrors the
                # oracle's FLOOR(rel*1e6 + 0.5)/1e6 — the 12-dp rel is a
                # terminating decimal, the class where Spark/DuckDB
                # round() semantics disagree at .5 boundaries.
                "rel": [math.floor(s[1] * 1e6 + 0.5) / 1e6 for s in sel],
            }
        )
        return out

    qid_type = dict(pool.dtypes)[qid_col]
    id_type = dict(pool.dtypes)[id_col]
    return pool.groupBy(qid_col).applyInPandas(
        mmr,
        schema=f"{qid_col} {qid_type}, {id_col} {id_type}, step int, rel double",
    )
