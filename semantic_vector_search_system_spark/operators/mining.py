"""Margin-based bitext candidate mining (the CCMatrix/LASER pipeline
stage; Artetxe & Schwenk 2019, "Margin-based Parallel Corpus Mining with
Multilingual Sentence Embeddings").

Production multilingual training corpora are mined by embedding two
monolingual collections and pairing sentences whose RATIO MARGIN

    margin(x, y) = cos(x, y) / ((mean_k cos(x, NN_k(x, Y))
                                 + mean_k cos(y, NN_k(y, X))) / 2)

exceeds a threshold — raw cosine alone over-pairs hub vectors, the
margin normalizes by each side's local neighborhood density. Beyond the
reference surface (its similarity stack stops at monolingual top-k);
part of the LLM-pipeline operator family.

Determinism (catalog rules): cosine is the shared sequential-fold
expression (functions/vectors.py — proven bit-identical to DuckDB's
``list_cosine_similarity``); neighborhood means sum ``round(cos, 12)``
in DECIMAL(38,12) so they are partitioning-invariant; the margin is one
IEEE division of identical doubles; ranking ties break on partner id;
output margins round to 6.

100 TB shape: the candidate set is the FORWARD top-k retrieval (x's k
nearest in Y) — exactly what a production miner scores, never all
pairs. At scale the forward/backward neighbor lists come from the ANN
stack (ivf_search_partitioned / LSH buckets) instead of this module's
bounded cross join: everything downstream of the two knn relations is
keyed aggregation + broadcast-size joins. The cross-join face is for
bounded relations only (the catalog oracle's shape), mirroring
``topk_bruteforce``'s contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.quantize import quantize

from ..functions.vectors import cosine_similarity


def _dec_mean_round12(col: Column) -> Column:
    """Exact mean of round-12 values: DECIMAL(38,12) sum / count — the
    partitioning-invariant mean the bigram-LM / BM25 family uses."""
    return (
        F.sum(F.round(col, 12).cast("decimal(38,12)")).cast("double")
        / F.count("*").cast("double")
    )


def margin_knn_pairs(
    xemb: DataFrame,
    yemb: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    x_id: str = "xid",
    y_id: str = "yid",
    x_vec: str = "xv",
    y_vec: str = "yv",
) -> DataFrame:
    """Best margin-scored partner per x: ``(xid, yid, margin)`` — for
    each x, its forward top-``k`` neighbors in Y are scored by the ratio
    margin and the best-scoring pair above ``threshold`` survives (ties
    on margin break to the smaller yid).

    Stages (all Catalyst expressions — the DuckDB oracle replays each):

    1. pairwise cosine over the two BOUNDED relations (cross join — at
       scale substitute the ANN stack's forward/backward knn relations,
       the shapes downstream are identical);
    2. forward ranking per x (cos desc, yid asc) and backward per y —
       the two knn lists;
    3. neighborhood means ``mx`` / ``my`` over each list's top-k
       (round-12 DECIMAL means);
    4. margin = cos / ((mx + my) / 2) over the FORWARD top-k candidate
       pairs; per-x argmax via rank (margin desc, yid asc).
    """
    x = xemb.select(F.col(x_id), F.col(x_vec).cast("array<double>").alias("_xv"))
    y = yemb.select(F.col(y_id), F.col(y_vec).cast("array<double>").alias("_yv"))
    p = x.crossJoin(y).select(
        x_id, y_id, cosine_similarity("_xv", "_yv").alias("_cos")
    )
    wf = Window.partitionBy(x_id).orderBy(F.desc("_cos"), F.asc(y_id))
    wb = Window.partitionBy(y_id).orderBy(F.desc("_cos"), F.asc(x_id))
    fwd = p.withColumn("_rf", F.row_number().over(wf)).filter(
        F.col("_rf") <= k
    )
    bwd = p.withColumn("_rb", F.row_number().over(wb)).filter(
        F.col("_rb") <= k
    )
    fx = fwd.groupBy(x_id).agg(_dec_mean_round12(F.col("_cos")).alias("_mx"))
    fy = bwd.groupBy(y_id).agg(_dec_mean_round12(F.col("_cos")).alias("_my"))
    m = (
        fwd.select(x_id, y_id, "_cos")
        .join(fx, x_id)
        .join(fy, y_id)
        .select(
            x_id,
            y_id,
            (
                F.round("_cos", 12)
                / ((F.col("_mx") + F.col("_my")) / F.lit(2.0))
            ).alias("_margin"),
        )
    )
    wm = Window.partitionBy(x_id).orderBy(F.desc("_margin"), F.asc(y_id))
    return (
        m.withColumn("_rm", F.row_number().over(wm))
        .filter((F.col("_rm") == 1) & (F.col("_margin") >= threshold))
        .select(x_id, y_id, quantize(F.col("_margin"), 6).alias("margin"))
    )


def margin_knn_pairs_from_knn(
    fwd: DataFrame,
    bwd: DataFrame,
    k: int = 4,
    threshold: float = 1.0,
    x_id: str = "xid",
    y_id: str = "yid",
    score_col: str = "score",
) -> DataFrame:
    """The SCALE face: margins from two PRE-RETRIEVED knn relations —
    ``fwd`` (x's top-k in Y) and ``bwd`` (y's top-k in X), both
    ``(x_id, y_id, score)`` rows from any retrieval (brute BLAS, IVF
    partition-pruned, LSH buckets). Everything here is keyed
    aggregation + equi-joins on the bounded knn rows: no vector moves,
    no cross join — the shape a 100 TB miner runs after its ANN pass.
    Semantics match :func:`margin_knn_pairs` when the knn lists match.
    """
    fx = fwd.groupBy(x_id).agg(
        _dec_mean_round12(F.col(score_col)).alias("_mx")
    )
    fy = bwd.groupBy(y_id).agg(
        _dec_mean_round12(F.col(score_col)).alias("_my")
    )
    m = (
        fwd.select(x_id, y_id, score_col)
        .join(fx, x_id)
        .join(fy, y_id)
        .select(
            x_id,
            y_id,
            (
                F.round(score_col, 12)
                / ((F.col("_mx") + F.col("_my")) / F.lit(2.0))
            ).alias("_margin"),
        )
    )
    wm = Window.partitionBy(x_id).orderBy(F.desc("_margin"), F.asc(y_id))
    return (
        m.withColumn("_rm", F.row_number().over(wm))
        .filter((F.col("_rm") == 1) & (F.col("_margin") >= threshold))
        .select(x_id, y_id, quantize(F.col("_margin"), 6).alias("margin"))
    )


def hard_negative_mine(
    queries: DataFrame,
    docs: DataFrame,
    positives: DataFrame,
    k: int = 5,
    pool_extra: int | None = None,
    qid_col: str = "qid",
    qvec_col: str = "qvec",
    id_col: str = "docid",
    vec_col: str = "vec",
) -> DataFrame:
    """Hard-negative mining for retrieval-model training (the DPR/ANCE
    shape: negatives = the retriever's own top-scored non-gold documents,
    the single highest-leverage training signal for dense retrievers).

    Per query: the ``k`` highest-cosine documents whose ``(qid, docid)``
    is NOT in ``positives``.  Returns ``(qid, docid, score, neg_rank)``,
    ``neg_rank`` 1-based by (score desc, docid).

    Physical shape (100 TB): one exact top-``(k + pool_extra)``
    retrieval through the partial-top-k brute kernel (or feed the pool
    from the ANN stack at scale), then a LEFT ANTI join against the
    positives relation and a per-query re-rank of the ≤ k+pool_extra
    survivors — the anti-join and window run on k-bounded rows, never
    the corpus.  ``pool_extra`` defaults to the max positives any query
    has (one tiny aggregate): at most that many pool rows can be
    positives, so the full-corpus top-k negatives are always inside the
    pool — exactness is structural, not probabilistic.

    Beyond the reference surface (its pipeline evaluates retrieval but
    never mines training pairs); LLM-pipeline operator family.
    """
    from .search import topk_bruteforce

    if pool_extra is None:
        row = (
            positives.groupBy(qid_col)
            .agg(F.count("*").alias("_n"))
            .agg(F.max("_n").alias("_m"))
            .collect()[0]
        )
        pool_extra = int(row["_m"] or 0)
    pool = topk_bruteforce(
        queries, docs, k=k + pool_extra, metric="cosine"
    )
    neg = pool.join(
        positives.select(qid_col, id_col), [qid_col, id_col], "left_anti"
    )
    w = Window.partitionBy(qid_col).orderBy("rank")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("neg_rank") <= k)
        .select(qid_col, id_col, "score", "neg_rank")
    )
