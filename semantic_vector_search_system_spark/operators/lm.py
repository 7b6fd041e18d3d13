"""Statistical language-model scoring (the CCNet-shape quality gate).

Production data pipelines gate documents on LM fluency (CCNet filters on
KenLM perplexity; the reference has no LM stage — this is part of the
training-data operator family beyond its surface). A full Kneser-Ney
n-gram LM is overkill for a relational engine; what the gate needs is a
monotone fluency score, and the add-one-smoothed bigram likelihood

    score(doc) = mean_i  (c(w_{i-1}, w_i) + 1) / (c(w_{i-1}, *) + V)

is exactly that while staying TRANSCENDENTAL-FREE (house oracle rule: no
ln/exp — perplexity is a monotone transform of the mean log-likelihood,
and for a ranking/threshold gate the probability mean ranks the same
direction; each summand is one IEEE double division of exact integers, so
both engines produce bit-identical ratios).

Training is two keyed aggregations over ONE bigram explode (conditioning
counts c(w1,*) derive from the bigram relation, not a second corpus
pass); scoring is an explode + two equi-joins against the count relations
(broadcast when the vocabulary fits, shuffle-keyed otherwise) + a
DECIMAL-exact mean (each ratio rounded to 12 decimals first, so the sum
is partitioning-invariant). 100 TB shape: count relations are
vocabulary-bounded, the corpus streams once for training and once for
scoring, no driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokenize


def _bigram_pairs(text_col: str) -> F.Column:
    """Array of (w1, w2) structs over the whitespace tokens; empty for
    docs with < 2 tokens. Guarded: Spark's ``sequence(1, 0)`` counts
    DOWN, so the index range only materializes when size >= 2."""
    t = tokenize(F.col(text_col))
    idx = F.sequence(F.lit(1), F.size(t) - 1)
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(t, i).alias("w1"), F.element_at(t, i + 1).alias("w2")
        ),
    )
    return F.when(F.size(t) >= 2, pairs).otherwise(
        F.array().cast("array<struct<w1:string,w2:string>>")
    )


def train_bigram_lm(
    train_docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Bigram LM "training" = counting: returns ``(cnt2, cnt1, vocab)`` —
    ``cnt2(w1, w2, c12)``, ``cnt1(w1, c1)`` with c1 = sum_w2 c12 (bigram
    starts, the correct MLE conditioning denominator), and the 1-row
    ``vocab(vs)`` distinct-token count for add-one smoothing."""
    pairs = train_docs.select(
        F.explode(_bigram_pairs(text_col)).alias("p")
    ).select("p.w1", "p.w2")
    cnt2 = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    cnt1 = cnt2.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        train_docs.select(F.explode(tokenize(F.col(text_col))).alias("tok"))
        .agg(F.count_distinct("tok").alias("vs"))
    )
    return cnt2, cnt1, vocab


def bigram_lm_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    doc_id: str = "doc_id",
    broadcast_counts: str = "cnt1",
) -> DataFrame:
    """Per-document add-one-smoothed bigram likelihood: ``(doc_id,
    n_bigrams, lm_score)`` — one row per scored doc with >= 1 bigram
    (docs of 0-1 tokens have no defined bigram likelihood and are
    dropped; gate them with the length rules instead).

    ``broadcast_counts`` pins the join strategy for the count relations
    (r7 VERDICT #4): natural-language token frequencies are Zipfian, so
    the exploded bigram side is HEAVILY skewed on w1 ("the" alone is
    ~5% of English bigram starts) — a shuffle join on w1 sends that 5%
    of a 100 TB corpus to one reducer if the optimizer misses the size.
    ``cnt1`` is vocabulary-bounded (one row per distinct w1), so the
    default broadcasts it; ``"both"`` additionally broadcasts ``cnt2``
    (one row per distinct bigram — broadcast it when vocab^2 fits,
    leaving the corpus-sized exploded side with NO pre-aggregation
    shuffle at all); ``"none"`` leaves both to the optimizer.

    Determinism: each ratio is a single IEEE division of exact-integer
    doubles (bit-identical in any engine), rounded to 12 decimals and
    summed in DECIMAL(38,12) — the mean is exact under any partitioning.
    """
    if broadcast_counts not in ("none", "cnt1", "both"):
        raise ValueError(f"unknown broadcast_counts {broadcast_counts!r}")
    cnt2, cnt1, vocab = model
    if broadcast_counts in ("cnt1", "both"):
        cnt1 = F.broadcast(cnt1)
    if broadcast_counts == "both":
        cnt2 = F.broadcast(cnt2)
    bg = docs.select(
        F.col(doc_id), F.explode(_bigram_pairs(text_col)).alias("p")
    ).select(doc_id, "p.w1", "p.w2")
    scored = (
        bg.join(cnt2, ["w1", "w2"], "left")
        .join(cnt1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "r",
            F.round(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vs")).cast("double"),
                12,
            ),
        )
    )
    return scored.groupBy(doc_id).agg(
        F.count("*").alias("n_bigrams"),
        F.round(
            F.sum(F.col("r").cast("decimal(38,12)")).cast("double")
            / F.count("*").cast("double"),
            6,
        ).alias("lm_score"),
    )


def perplexity_buckets(
    scored: DataFrame,
    n_buckets: int = 3,
    score_col: str = "lm_score",
    doc_id: str = "doc_id",
    num_partitions: int | None = None,
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): rank every
    scored document by LM fluency and cut the ranking into ``n_buckets``
    equal NTILE buckets — bucket 1 = "head" (most fluent), last =
    "tail"; pipelines keep head+middle or reweight by bucket. Returns
    ``(doc_id, n_bigrams, lm_score, bucket)``.

    Scale shape: NTILE over a global order is the textbook
    single-reducer trap (Spark plans an unpartitioned window as a sort
    into ONE partition). This rides
    :func:`...functions.ranking.global_row_number` instead —
    range-repartitioned parallel sort + per-partition offsets, driver
    traffic O(partitions) — and converts rank to bucket with
    :func:`...functions.ranking.ntile_from_rank`, which replicates SQL
    NTILE semantics exactly (parity-tested against Spark's own ntile).
    The order is total (score desc, doc_id asc), so bucket assignment is
    deterministic under any partitioning. The one scalar driver value is
    the total row count (needed by any NTILE; one tiny aggregate).
    """
    from ..functions.ranking import global_row_number, ntile_from_rank

    total = scored.count()
    if total == 0:
        return scored.select(
            doc_id, "n_bigrams", score_col, F.lit(0).cast("long").alias("bucket")
        ).limit(0)
    ranked = global_row_number(
        scored,
        [F.col(score_col).desc(), F.col(doc_id).asc()],
        rank_col="__rank",
        num_partitions=num_partitions,
    )
    return ranked.select(
        doc_id,
        "n_bigrams",
        score_col,
        ntile_from_rank(F.col("__rank"), total, n_buckets).alias("bucket"),
    )
