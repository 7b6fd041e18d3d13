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
from ..functions.quantize import quantize
from ..functions.text import py_tokenize, tokenize


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
    strategy: str = "expr",
) -> DataFrame:
    """Select the ``k`` raw documents that look most like the target
    corpus: ``(doc_id, n_feats, dsir_score, rank)``, rank 1 = most
    target-like (ties on doc_id). Docs with zero tokens have no
    features and are never selected (gate them with length rules).

    ``strategy="expr"`` is the oracle face (explode + md5 expressions +
    DECIMAL aggregation); ``"fast"`` the Arrow-kernel face with memoized
    digests and driver-precomputed exact integer ratios —
    BITWISE-identical output (parity-tested), and the only viable shape
    when gram instances reach 10^8 (measured: >9 min vs tens of seconds
    at 1M docs / 111M tokens)."""
    if strategy not in ("expr", "fast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "fast":
        return _dsir_topk_fast(raw_docs, target_docs, k, n_buckets, text_col, doc_id)
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
            # quantize, not F.round (r10 VERDICT #2): the likelihood
            # ratio is a rational of integer counts — the cross-engine
            # .5-boundary class; FLOOR(x·1e12+0.5)/1e12 is engine-pinned.
            "r",
            quantize(
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
        quantize(
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


# Gram definition shared by every fast face: unigrams = py_tokenize(text)
# (functions.text.tokenize's Java-\s+ class, NOT str.split(): that also
# splits on NBSP/\x85/unicode line separators etc., which would give
# different features under strategy='fast' / dsir_score_batch / the
# streaming gate than under strategy='expr' — r8 ADVICE fix,
# parity-pinned by test_dsir unicode-whitespace case); bigrams =
# "w1 w2" over adjacent tokens.


def _feat_fns(n_buckets: int):
    """The md5 feature hash with worker-global memos, split by gram kind
    (the encode-kernel precedent): md5 runs once per DISTINCT gram per
    worker.  Bigrams memo on the TOKEN TUPLE so the hot loop never
    builds the "w1 w2" string (or hashes it) for a pair it has already
    seen — the string join + digest run only on memo misses."""
    import hashlib

    uni_memo: dict[str, int] = {}
    bi_memo: dict[tuple, int] = {}

    def feat_of(g: str) -> int:
        f = uni_memo.get(g)
        if f is None:
            f = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % n_buckets
            uni_memo[g] = f
        return f

    def feat_of_bi(p: tuple) -> int:
        f = bi_memo.get(p)
        if f is None:
            g = p[0] + " " + p[1]
            f = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % n_buckets
            bi_memo[p] = f
        return f

    return feat_of, feat_of_bi


def _count_kernel(n_buckets: int, text_col: str):
    """Per-batch hashed-gram counting; each batch emits at most n_buckets
    partial rows.

    r14 (guide §4.2 — vectorize inside the kernel): gram instances are
    counted at BATCH level by ``Counter.update`` (C-speed
    ``_count_elements`` over the token list / bigram-tuple zip), and the
    Python-level work — memo probe + feature bucketing — runs once per
    DISTINCT gram per batch instead of once per INSTANCE.  On the 1M
    bench corpus (~211M gram instances, tiny generator vocabulary) that
    removes ~99% of the interpreted iterations; output is the identical
    integer count relation (instance-level sums commute)."""
    import pandas as pd

    feat_of, feat_of_bi = _feat_fns(n_buckets)

    def fn(batches):
        from collections import Counter

        for pdf in batches:
            tc: Counter = Counter()
            bc: Counter = Counter()
            for t in pdf[text_col]:
                if t:
                    toks = py_tokenize(t)
                    tc.update(toks)
                    if len(toks) > 1:
                        bc.update(zip(toks, toks[1:]))
            c: Counter = Counter()
            for tok, k in tc.items():
                c[feat_of(tok)] += k
            for p, k in bc.items():
                c[feat_of_bi(p)] += k
            if c:
                yield pd.DataFrame(
                    {"feat": list(c.keys()), "pc": list(c.values())}
                )

    return fn, feat_of


def _score_kernel(n_buckets: int, text_col: str, doc_id: str, int_r: dict):
    """Per-doc scoring kernel shared by the fast face and the stored-model
    serving face (r14, guide §4.2): per-doc gram counts via C-speed
    ``Counter`` over the token list / bigram-tuple zip (no per-instance
    string building), and a worker-global memo from DISTINCT gram straight
    to its exact 1e-12-scaled integer ratio.  The summed integer is
    bitwise the per-instance loop's (instance sums commute), so the
    Decimal replay — exact decimal sum -> double (cast), one IEEE
    division, round-6 HALF_UP — is unchanged."""
    import math
    from decimal import Decimal

    feat_of, feat_of_bi = _feat_fns(n_buckets)
    r_uni: dict[str, int] = {}
    r_bi: dict[tuple, int] = {}

    def score_fn(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            ids, nfs, scs = [], [], []
            for did, t in zip(pdf[doc_id], pdf[text_col]):
                if not t:
                    continue
                toks = py_tokenize(t)
                nt = len(toks)
                if nt == 0:
                    continue
                n = nt + (nt - 1 if nt > 1 else 0)
                total = 0
                for tok, k in Counter(toks).items():
                    v = r_uni.get(tok)
                    if v is None:
                        v = int_r[feat_of(tok)]
                        r_uni[tok] = v
                    total += k * v
                if nt > 1:
                    for p, k in Counter(zip(toks, toks[1:])).items():
                        v = r_bi.get(p)
                        if v is None:
                            v = int_r[feat_of_bi(p)]
                            r_bi[p] = v
                        total += k * v
                # exact decimal sum -> double (cast), one IEEE division,
                # round-6 HALF_UP: F.round semantics replayed exactly
                mean = float(Decimal(total).scaleb(-12)) / float(n)
                ids.append(did)
                nfs.append(n)
                scs.append(math.floor(mean * 1e6 + 0.5) / 1e6)
            if ids:
                yield pd.DataFrame(
                    {doc_id: ids, "n_feats": nfs, "dsir_score": scs}
                )

    return score_fn


def _fast_counts(
    docs, n_buckets: int, text_col: str
) -> tuple[dict[int, int], int]:
    """Corpus feature counts as a driver dict: one narrow kernel pass
    (<= n_buckets partial rows per batch), one tiny keyed agg, one
    bounded collect (<= n_buckets rows — the same size as the broadcast
    the expr face ships the other way)."""
    fn, _ = _count_kernel(n_buckets, text_col)
    parts = docs.select(text_col).mapInPandas(fn, schema="feat long, pc long")
    rows = parts.groupBy("feat").agg(F.sum("pc").alias("c")).collect()
    d = {int(r["feat"]): int(r["c"]) for r in rows}
    return d, sum(d.values())


def _dsir_topk_fast(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    k: int,
    n_buckets: int,
    text_col: str,
    doc_id: str,
) -> DataFrame:
    """Arrow-kernel face of :func:`dsir_topk`, BITWISE-identical output
    (parity-tested): per-feature ratios precompute ONCE driver-side as
    exact 1e-12-scaled integers (``floor(r·1e12 + 0.5)`` — the expr
    face's quantize-12/DECIMAL(38,12) semantics, FLOOR form per r10
    VERDICT #2), per-doc scores are exact integer sums replayed through
    Decimal for the final cast/divide/quantize-6 — no
    per-gram md5 expressions, no corpus-sized explode, no 10^8-row
    DECIMAL aggregation. Measured at 1M docs (111M tokens): the expr
    face exceeds 9 minutes; this face is tens of seconds."""
    import math

    ct, tn = _fast_counts(target_docs, n_buckets, text_col)
    cr, rn = _fast_counts(raw_docs, n_buckets, text_col)
    int_r: dict[int, int] = {}
    for f in range(n_buckets):
        r = ((ct.get(f, 0) + 1.0) / (tn + n_buckets)) / (
            (cr.get(f, 0) + 1.0) / (rn + n_buckets)
        )
        # the expr face's quantize(r, 12), scaled (FLOOR form, r10 #2)
        int_r[f] = math.floor(r * 1e12 + 0.5)

    score_fn = _score_kernel(n_buckets, text_col, doc_id, int_r)
    id_type = dict(raw_docs.dtypes)[doc_id]
    rep = raw_docs.select(doc_id, text_col).mapInPandas(
        score_fn, schema=f"{doc_id} {id_type}, n_feats long, dsir_score double"
    )
    top = rep.orderBy(F.col("dsir_score").desc(), F.col(doc_id)).limit(k)
    w = Window.orderBy(F.col("dsir_score").desc(), F.col(doc_id))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def write_dsir_model(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    table_prefix: str,
    *,
    n_buckets: int = 512,
    text_col: str = "text",
) -> dict:
    """Fit and PERSIST the DSIR importance model as warehouse tables —
    the selection-family analog of ``write_bm25_index``: a crawl-loop
    scorer reads the per-feature ratio relation from storage and never
    re-counts either training corpus.

    Writes ``<prefix>_ratios`` — ONE row per feature bucket ``(feat, r,
    int_r)`` with ``r`` the round-12 likelihood ratio (the exact value
    the expr face computes) and ``int_r`` its exact 1e-12-scaled
    integer (what the fast face sums) — and ``<prefix>_meta`` (one row:
    ``n_buckets`` plus the two gram-instance totals ``tn``/``rn`` that,
    with the per-feature ratios, fully determine every score; the
    per-feature count maps ct/cr are folded into the ratios and NOT
    persisted.  The n_buckets check means a batch hashed under a
    different width can never silently probe an incompatible model).
    The whole model is <= n_buckets rows: the 100 TB corpora compress
    to kilobytes of serving state."""
    import math

    spark = raw_docs.sparkSession
    ct, tn = _fast_counts(target_docs, n_buckets, text_col)
    cr, rn = _fast_counts(raw_docs, n_buckets, text_col)
    rows = []
    for f in range(n_buckets):
        r = ((ct.get(f, 0) + 1.0) / (tn + n_buckets)) / (
            (cr.get(f, 0) + 1.0) / (rn + n_buckets)
        )
        iq = math.floor(r * 1e12 + 0.5)  # quantize(r, 12), scaled
        rows.append((f, iq / 1e12, iq))
    spark.createDataFrame(
        rows, "feat long, r double, int_r long"
    ).write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_ratios"
    )
    meta = {"n_buckets": n_buckets, "tn": tn, "rn": rn}
    spark.createDataFrame(
        [(n_buckets, tn, rn)], "n_buckets int, tn long, rn long"
    ).write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_meta"
    )
    return meta


def dsir_score_batch(
    batch_docs: DataFrame,
    table_prefix: str,
    k: int = 50,
    text_col: str = "text",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Score a NEW batch against the STORED importance model — the
    daily-crawl serving loop: the training corpora are never re-read;
    the model is the <= n_buckets-row ratio relation. Batch-equivalence
    contract (tested): scoring the training raw pool through this
    function reproduces ``dsir_topk`` exactly. Same kernel as the fast
    face (memoized digests, exact integer sums), ratios from storage."""
    spark = batch_docs.sparkSession
    meta = spark.read.table(f"{table_prefix}_meta").first().asDict()
    n_buckets = int(meta["n_buckets"])
    int_r = {
        int(r["feat"]): int(r["int_r"])
        for r in spark.read.table(f"{table_prefix}_ratios").collect()
    }  # bounded: n_buckets rows (the whole stored model)
    score_fn = _score_kernel(n_buckets, text_col, doc_id, int_r)
    id_type = dict(batch_docs.dtypes)[doc_id]
    rep = batch_docs.select(doc_id, text_col).mapInPandas(
        score_fn, schema=f"{doc_id} {id_type}, n_feats long, dsir_score double"
    )
    top = rep.orderBy(F.col("dsir_score").desc(), F.col(doc_id)).limit(k)
    w = Window.orderBy(F.col("dsir_score").desc(), F.col(doc_id))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))
