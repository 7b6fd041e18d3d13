"""Data Selection via Importance Resampling (the DSIR shape).

Xie et al. 2023 ("Data Selection for Language Models via Importance
Resampling") select raw-web documents whose hashed n-gram feature
distribution resembles a curated target corpus: fit bag-of-hashed-ngram
models p_target and p_raw, weight each candidate by the likelihood
ratio, and resample. It is the standard "make CommonCrawl look like
Wikipedia+books" pre-training selection stage; the reference pipeline
(a retrieval system) has no analog — this belongs to the
training-data operator family beyond its surface.

Transcendental-free adaptation (house oracle rule: no ln/exp): the
paper scores sum_f c_f(x)*(log p_t(f) - log p_r(f)); this engine scores
the MEAN PER-FEATURE LIKELIHOOD RATIO

    score(x) = mean_{f in feats(x)}  p_hat_t(f) / p_hat_r(f)

with add-one smoothing over the fixed hashed-feature space of size B
(p_hat(f) = (c(f)+1)/(total+B)). The arithmetic mean of ratios is not
the paper's geometric form, but it is a monotone "looks like the
target" signal of the same inputs, and every value is replayable: each
ratio is three IEEE divisions of exact integers (bit-identical in any
engine), rounded to 12 decimals and DECIMAL-summed, so the per-doc mean
survives any partitioning (the ``bigram_lm_score`` contract).

Features are hashed unigrams + bigrams (the paper's hashed bigrams,
with unigrams added so one-token docs still score): ``stable_hash64``
of the token (or "w1 w2") mod ``n_buckets``.

100 TB shape: both count relations are BUCKET-BOUNDED (<= n_buckets
rows) and broadcast — the raw corpus streams once for counting and once
for scoring with NO shuffle on the exploded side before its per-doc
DECIMAL mean (map-side partials bound the reducer); selection is a
global top-k (TakeOrderedAndProject: per-partition bounded heaps, never
a single-partition sort).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash_bucket
from ..functions.text import tokenize


def hashed_ngram_features(
    docs: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """``(doc_id, feat)`` — one row per unigram and bigram INSTANCE
    (counts matter: DSIR weights features by occurrence), ``feat`` in
    ``[0, n_buckets)`` via the pinned md5 hash of the token or
    "w1 w2" bigram string."""
    t = tokenize(F.col(text_col))
    uni = F.when(F.size(t) >= 1, t).otherwise(
        F.array().cast("array<string>")
    )
    big = F.when(
        F.size(t) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - 1),
            lambda i: F.concat_ws(" ", F.element_at(t, i), F.element_at(t, i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(doc_id), F.explode(F.concat(uni, big)).alias("g")
    ).select(doc_id, stable_hash_bucket(F.col("g"), n_buckets).alias("feat"))


def dsir_topk(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int = 50,
    n_buckets: int = 512,
    text_col: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Select the ``k`` raw documents that look most like the target
    corpus: ``(doc_id, n_feats, dsir_score, rank)``, rank 1 = most
    target-like (ties on doc_id). Docs with zero tokens have no
    features and are never selected (gate them with length rules)."""
    tf = hashed_ngram_features(target_docs, n_buckets, text_col, doc_id)
    rf = hashed_ngram_features(raw_docs, n_buckets, text_col, doc_id)
    ct = tf.groupBy("feat").agg(F.count("*").alias("ct"))
    cr = rf.groupBy("feat").agg(F.count("*").alias("cr"))
    tt = tf.agg(F.count("*").alias("tn"))  # 1 row
    tr = rf.agg(F.count("*").alias("rn"))  # 1 row
    b = F.lit(int(n_buckets))
    scored = (
        rf.join(F.broadcast(ct), "feat", "left")
        .join(F.broadcast(cr), "feat", "left")
        .crossJoin(F.broadcast(tt))
        .crossJoin(F.broadcast(tr))
        .withColumn(
            "r",
            F.round(
                (
                    (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
                    / (F.col("tn") + b)
                )
                / (
                    (F.coalesce(F.col("cr"), F.lit(0)) + F.lit(1.0))
                    / (F.col("rn") + b)
                ),
                12,
            ),
        )
    )
    rep = scored.groupBy(doc_id).agg(
        F.count("*").alias("n_feats"),
        F.round(
            F.sum(F.col("r").cast("decimal(38,12)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("dsir_score"),
    )
    top = rep.orderBy(F.col("dsir_score").desc(), F.col(doc_id)).limit(k)
    # rank the k survivors: the window runs over a k-row relation (the
    # limit's TakeOrderedAndProject already bounded it), not the corpus
    w = Window.orderBy(F.col("dsir_score").desc(), F.col(doc_id))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
