"""Training-corpus quality filtering, PII scanning, and decontamination.

Standard large-scale pretraining-data operators beyond the reference's own
surface (the reference evaluates retrieval over a synthetic corpus; a real
100 TB pipeline must also *select* the corpus). Three families:

* **Repetition / heuristic quality rules** (C4/Gopher-style): per-document
  duplicate n-gram fractions, top-token dominance, mean token length,
  stopword ratio -> boolean rule flags -> keep/drop. Pure Catalyst
  higher-order-function expressions: a narrow map over the corpus scan, no
  shuffle, linear to 100 TB.

* **PII scan / redaction**: regex detection counts (email, phone, IPv4) and
  redaction via ``regexp_replace``. Patterns stay in the RE2-compatible
  subset (no lookaround/backrefs) so Java regex (Spark) and RE2 (DuckDB)
  agree — the oracle checks the counts bit-for-bit.

* **Decontamination**: flag training documents sharing any ``n``-token
  shingle with an evaluation set (the standard benchmark-leakage guard).
  Join-shaped: eval shingle hashes (tiny) broadcast against the exploded doc
  shingle stream; at 100 TB this is one corpus scan + a broadcast hash join,
  aggregated back to one row per contaminated document.

Determinism: md5-based ``stable_hash64`` shingle keys, arithmetic-only
scores (module rules in plans/catalog.py docstring).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64
from ..functions.quantize import quantize
from ..functions.text import token_shingles, tokenize
from .textanalysis import STOPWORDS

# RE2-safe patterns (work identically under Java regex and DuckDB's RE2).
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def _dup_fraction(tokens: Column, n: int) -> Column:
    """Fraction of n-gram occurrences that are repeats of an earlier one:
    ``1 - distinct/total`` (0 for docs with < n tokens -> single shingle)."""
    sh = token_shingles(tokens, n=n)
    total = F.size(sh)
    return F.lit(1.0) - F.size(F.array_distinct(sh)).cast("double") / total


def repetition_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document repetition profile.

    Columns: n_tokens, dup_2gram_frac, dup_3gram_frac, top_token_frac (count
    of the most frequent token / n_tokens), mean_token_len, stopword_ratio.

    top_token_frac scans distinct×all tokens per row (O(u*n) inside codegen)
    — bounded by document length, still a narrow map; for million-token
    documents switch to the explode+groupBy formulation.
    """
    toks = tokenize(text_col)
    d = docs.select(id_col, *extra_cols, toks.alias("__toks"))
    n = F.size("__toks")
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct("__toks"),
            lambda t: F.size(F.filter("__toks", lambda x: x == t)),
        )
    )
    def _per_token(num: Column) -> Column:
        # Empty/whitespace-only documents have n == 0: under Spark 4's
        # default ANSI mode a bare division is a DIVIDE_BY_ZERO job failure,
        # but garbage input must flag as too_short, not kill the corpus
        # scan. Ratios default to 0.0 (too_short trips on n_tokens alone).
        # quantize, not F.round (r10 VERDICT #2): these are ratios of
        # token counts — the cross-engine .5-boundary class (a doc with
        # 128·odd tokens and an odd numerator lands EXACTLY on a 7-digit
        # half-way point, where Spark and DuckDB round() disagree).
        return F.when(n > 0, quantize(num.cast("double") / n, 6)).otherwise(F.lit(0.0))

    return d.select(
        id_col,
        *extra_cols,
        n.cast("long").alias("n_tokens"),
        quantize(_dup_fraction(F.col("__toks"), 2), 6).alias("dup_2gram_frac"),
        quantize(_dup_fraction(F.col("__toks"), 3), 6).alias("dup_3gram_frac"),
        _per_token(top_cnt).alias("top_token_frac"),
        _per_token(
            F.aggregate("__toks", F.lit(0).cast("long"), lambda a, t: a + F.length(t))
        ).alias("mean_token_len"),
        _per_token(
            F.size(F.filter("__toks", lambda t: t.isin(*STOPWORDS)))
        ).alias("stopword_ratio"),
    )


# Gopher-style rule thresholds, tuned to the synthetic corpus's word-soup
# profile so both outcomes occur (a rule nothing trips is untested).
GOPHER_RULES: dict[str, str] = {
    "too_short": "n_tokens < 20",
    "too_long": "n_tokens > 100000",
    "token_len_out_of_range": "mean_token_len < 4.0 OR mean_token_len > 10.0",
    "high_repetition": "dup_2gram_frac > 0.1",
    "top_token_dominant": "top_token_frac > 0.2",
    "stopword_heavy": "stopword_ratio > 0.12",
}


def gopher_quality_flags(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Repetition stats + one boolean column per rule + ``keep`` (no rule
    tripped). Rules are SQL predicate strings shared verbatim with the
    DuckDB oracle."""
    st = repetition_stats(docs, id_col, text_col, extra_cols=extra_cols)
    for rule, pred in GOPHER_RULES.items():
        st = st.withColumn(rule, F.expr(pred))
    keep = None
    for rule in GOPHER_RULES:
        trip = F.col(rule)
        keep = trip if keep is None else (keep | trip)
    return st.withColumn("keep", ~keep)


def pii_scan(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-document PII match counts, one column per pattern + total."""
    out = docs.select(
        id_col,
        *extra_cols,
        *[
            F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(f"n_{name}")
            for name, p in PII_PATTERNS.items()
        ],
    )
    total = None
    for name in PII_PATTERNS:
        c = F.col(f"n_{name}")
        total = c if total is None else (total + c)
    return out.withColumn("n_pii", total)


def pii_redact(
    docs: DataFrame, text_col: str = "text", replacement: str = "[PII]"
) -> DataFrame:
    """Replace every PII match with ``replacement`` (order: email, phone,
    ipv4 — email first so its local part isn't half-eaten by the phone
    pattern's digit runs)."""
    c = F.col(text_col)
    for p in PII_PATTERNS.values():
        c = F.regexp_replace(c, p, replacement)
    return docs.withColumn(text_col, c)


def decontaminate(
    docs: DataFrame,
    eval_texts: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    eval_text_col: str = "text",
) -> DataFrame:
    """Training docs sharing >= 1 ``n``-token shingle with the eval set.

    Returns ``(doc_id, n_overlap_shingles, n_eval_hits)`` — distinct
    overlapping shingle hashes and distinct eval items hit. Physical shape:
    eval shingles (benchmarks are ~1e3-1e6 rows) hashed + exploded +
    broadcast; corpus shingles exploded and inner-joined on the hash; one
    aggregation keyed by doc id. The corpus is scanned once; the only
    shuffle is the final per-doc aggregation, keyed by the same doc_id the
    explode preserved (AQE coalesces the tail).
    """
    doc_sh = docs.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(token_shingles(tokenize(text_col), n=n))
        ).alias("__sh"),
    ).select(id_col, stable_hash64("__sh").alias("h"))
    eval_sh = eval_texts.select(
        F.col(eval_id_col),
        F.explode(
            F.array_distinct(token_shingles(tokenize(eval_text_col), n=n))
        ).alias("__sh"),
    ).select(eval_id_col, stable_hash64("__sh").alias("h"))
    hits = doc_sh.join(F.broadcast(eval_sh), "h")
    return hits.groupBy(id_col).agg(
        F.count_distinct("h").alias("n_overlap_shingles"),
        F.count_distinct(eval_id_col).alias("n_eval_hits"),
    )


def hash_feature_weights(tokens: Column, *, salt: str = "qw1") -> Column:
    """Deterministic per-token linear weights in [-1, 1]: ``w(tok) =
    (stable_hash64(salt || tok) % 2001 - 1000) / 1000`` — the stand-in for
    a trained classifier's hashed-feature weight table, bit-identical in
    Spark / DuckDB / python (pinned md5 hash, integer arithmetic, one
    exact division). A REAL weight table (fastText/logreg export) plugs
    into :func:`linear_quality_margin` as a (tok, w) DataFrame instead."""
    return F.transform(
        tokens,
        lambda t: (
            (
                F.pmod(stable_hash64(F.concat(F.lit(salt), t)), F.lit(2001))
                - F.lit(1000)
            ).cast("double")
            / F.lit(1000.0)
        ),
    )


def _margin_sum_col(toks) -> Column:
    """Exact DECIMAL(38,12) fold of the hashed per-token feature weights.

    Each step recast to (38,12): Spark widens decimal addition to (38,11)
    for carry headroom, which would break the fold's type; per-token
    margins are in [-1, 1], so thousands of terms stay far from the
    26-integer-digit bound and the recast is lossless."""
    return F.aggregate(
        hash_feature_weights(toks),
        F.lit(0).cast("decimal(38,12)"),
        lambda acc, w: (acc + w.cast("decimal(38,12)")).cast("decimal(38,12)"),
    ).cast("double")


def quality_accept_col(text_col="text") -> Column:
    """The ``accept`` decision of :func:`linear_quality_margin`
    (weights=None path) as a ROW-LOCAL boolean Column — bitwise the same
    per-row decision, usable as a plain ``filter`` so pipeline stages
    (e.g. the curation funnel's classifier gate) never pay a doc-keyed
    join for what is a narrow projection.  Zero-token rows are rejected,
    matching the relation face's drop of them."""
    toks = tokenize(text_col)
    n_tok = F.size(toks).cast("long")
    margin = _margin_sum_col(toks) / n_tok.cast("double")
    return (n_tok > 0) & (margin > 0)


def _linear_quality_margin_fast(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    extra_cols: tuple[str, ...],
) -> DataFrame:
    """Arrow-kernel face of the weights=None margin, BITWISE-identical
    output (parity-tested vs the expression face; the dsir/lm fast-face
    recipe applied to the quality classifier — r14, guide §4.2).

    Why the replay is exact: the stand-in weight is ``w(tok) = k/1000.0``
    with ``k = stable_hash64('qw1'||tok) % 2001 - 1000`` an integer in
    [-1000, 1000].  The double ``k/1000.0`` casts to DECIMAL(38,12) as
    EXACTLY ``k·1e-3`` (a 3-decimal value is its own shortest repr;
    HALF_UP at 12 places is lossless), so the expr face's running
    DECIMAL fold is ``Σk · 1e-3`` and its final double cast is the
    correctly-rounded double of ``Σk/1000`` — replayed here as
    ``float(Decimal(Σk).scaleb(-3))``, followed by the same one IEEE
    division by n_tokens.  Per-token md5 runs once per DISTINCT token
    per worker (memo); per-doc token counts come from C-speed
    ``Counter``; zero-token docs are dropped exactly like both
    relational faces."""
    from decimal import Decimal

    from ..functions.hashing import stable_hash64_py
    from ..functions.text import py_tokenize

    dt = dict(docs.dtypes)
    cols = [id_col, *extra_cols]
    schema = ", ".join(
        [f"`{c}` {dt[c]}" for c in cols] + ["n_tokens long", "margin double"]
    )

    def fn(batches):
        from collections import Counter

        import pandas as pd

        memo: dict[str, int] = {}

        def k_of(tok: str) -> int:
            v = memo.get(tok)
            if v is None:
                v = stable_hash64_py("qw1" + tok) % 2001 - 1000
                memo[tok] = v
            return v

        for pdf in batches:
            kept_idx, nt_l, mg_l = [], [], []
            for i, t in enumerate(pdf[text_col]):
                toks = py_tokenize(t) if t else []
                n = len(toks)
                if n == 0:
                    continue
                total = 0
                for tok, c in Counter(toks).items():
                    total += c * k_of(tok)
                kept_idx.append(i)
                nt_l.append(n)
                mg_l.append(float(Decimal(total).scaleb(-3)) / float(n))
            if kept_idx:
                sub = pdf if len(kept_idx) == len(pdf) else pdf.iloc[kept_idx]
                out = {c: sub[c].to_numpy() for c in cols}
                out["n_tokens"] = nt_l
                out["margin"] = mg_l
                yield pd.DataFrame(out)

    rep = docs.select(*cols, text_col).mapInPandas(fn, schema=schema)
    return rep.withColumn("accept", F.col("margin") > 0)


def linear_quality_margin(
    docs: DataFrame,
    weights: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    extra_cols: tuple[str, ...] = (),
    strategy: str = "expr",
) -> DataFrame:
    """Model-based quality filtering, the classifier stage of production
    training-data pipelines (a fastText/logreg quality model scores every
    document; GPT-3- and LLaMA-style data prep both gate on one): mean
    per-token feature weight = the linear margin over hashed
    bag-of-words features. ``margin > 0`` is the accept decision (margin,
    not probability — the sigmoid is monotone, so thresholding the margin
    IS thresholding the probability, and the oracle stays free of
    transcendentals per the catalog determinism rules).

    Returns ``(id, *extra_cols, n_tokens, margin, accept)``.

    With ``weights=None`` the deterministic :func:`hash_feature_weights`
    table stands in — the margin is computed per-row as an exact
    DECIMAL(38,12) fold over the token array: a pure narrow projection, no
    explode, no shuffle, no Python. With a real ``(tok, w)`` weight table
    the same margin is an explode + broadcast-join + per-doc aggregation
    (the weight table is vocabulary-sized — MBs — and broadcasts; the only
    shuffle is the doc-keyed mean).

    ``strategy`` (weights=None only): ``"expr"`` (default, the oracle
    face) or ``"fast"`` — the Arrow kernel with per-distinct-token
    memoized digests, BITWISE-identical output (parity-tested; see
    :func:`_linear_quality_margin_fast` for the exactness argument).
    The fast face is the 10^8-token bench/serving path: the expr face
    pays one md5 EXPRESSION per token INSTANCE inside the fold.
    """
    if strategy not in ("expr", "fast"):
        raise ValueError(f"unknown strategy {strategy!r}")
    if strategy == "fast":
        if weights is not None:
            raise ValueError(
                "strategy='fast' replays the deterministic weights=None "
                "margin; pass weights through the expr face"
            )
        return _linear_quality_margin_fast(docs, id_col, text_col, extra_cols)
    toks = tokenize(text_col)
    if weights is None:
        margin_sum = _margin_sum_col(toks)
        n_tok = F.size(toks).cast("long")
        # zero-token docs (empty/whitespace-only text) are DROPPED — the
        # contract of both physical paths (the weight-table path's inner
        # join drops them naturally) and of the DuckDB oracle (unnest of
        # an empty token list yields no rows); without this filter the
        # no-weights path alone would keep them with a NULL margin
        return (
            docs.select(
                F.col(id_col),
                *[F.col(c) for c in extra_cols],
                n_tok.alias("n_tokens"),
                (margin_sum / n_tok.cast("double")).alias("margin"),
            )
            .filter(F.col("n_tokens") > 0)
            .withColumn("accept", F.col("margin") > 0)
        )
    tok_rows = docs.select(
        F.col(id_col), F.explode(toks).alias("tok")
    )
    scored = tok_rows.join(F.broadcast(weights), "tok", "left").select(
        id_col, F.coalesce("w", F.lit(0.0)).alias("w")
    )
    agg = scored.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        (
            F.sum(F.col("w").cast("decimal(38,12)")).cast("double")
            / F.count("*").cast("double")
        ).alias("margin"),
    )
    base = docs.select(F.col(id_col), *[F.col(c) for c in extra_cols])
    return base.join(agg, id_col).withColumn("accept", F.col("margin") > 0)


def train_quality_perceptron(
    docs: DataFrame,
    label_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    epochs: int = 3,
    checkpoint: bool = True,
) -> tuple[DataFrame, list[dict]]:
    """TRAIN the quality-classifier gate in-engine (r10): a batch
    perceptron over bag-of-words token counts — the missing half of
    :func:`linear_quality_margin`, which until now could only SERVE
    fixed/imported weights.  Production pipelines train exactly this
    shape of cheap linear gate on labeled good/bad documents (the GPT-3 /
    LLaMA quality-classifier stage); the batch perceptron is its
    integer-exact relational form:

    * features: per-doc token counts ``c`` (one corpus tokenize, the
      relation is CHECKPOINTED so every epoch reuses it — the corpus
      streams ONCE regardless of epochs);
    * epoch update: margins ``m_i = Σ_tok w[tok]·c_i[tok]`` (weights are
      vocabulary-bounded and broadcast), then
      ``w += Σ_{y_i·m_i <= 0} y_i·c_i`` over the misclassified docs —
      ONE doc-keyed aggregation + ONE token-keyed aggregation per epoch,
      both map-side combinable;
    * everything is INTEGER arithmetic (counts, ±1 labels, integer
      weights), so the trajectory is bit-exact under any partitioning —
      the same determinism class as BPE training, with an unrolled-epoch
      SQL oracle (catalog row ``perceptron_quality_weights``).

    ``label_col`` must be boolean (true = good document).  Returns
    ``(weights, history)``: ``weights`` is the final ``(tok, w)``
    relation (``w`` long, zero-weight tokens dropped) — cast ``w`` to
    double and it plugs straight into ``linear_quality_margin(weights=)``
    for serving; ``history`` is one dict per epoch with the
    misclassified-doc count BEFORE that epoch's update (epoch 0 counts
    every doc: all margins are 0 under ``w=0`` and the perceptron
    updates on ``y·m <= 0``).

    Scale: weights never exceed the vocabulary; per epoch the checkpointed
    count relation is scanned once; the history counts are 1-row collects.
    ``checkpoint=False`` keeps the full multi-epoch lineage (each epoch
    then re-derives its predecessors — tests use it to plan-gate the
    broadcast-join/partial-agg shapes; production keeps the default).
    """
    y = F.when(F.col(label_col), F.lit(1)).otherwise(F.lit(-1))
    tc = (
        docs.select(F.col(id_col), y.alias("_y"), F.explode(tokenize(text_col)).alias("tok"))
        .groupBy(id_col, "_y", "tok")
        .agg(F.count("*").alias("c"))
    )
    if checkpoint:
        tc = tc.localCheckpoint()
    spark = docs.sparkSession
    weights = spark.createDataFrame([], "tok string, w long")
    history: list[dict] = []
    for epoch in range(epochs):
        margins = (
            tc.join(F.broadcast(weights), "tok", "left")
            .groupBy(id_col, "_y")
            .agg(F.sum(F.coalesce(F.col("w"), F.lit(0)) * F.col("c")).alias("_m"))
        )
        miscl = margins.filter(F.col("_y") * F.col("_m") <= 0)
        n_miscl = miscl.count()
        history.append({"epoch": epoch, "n_misclassified": int(n_miscl)})
        if n_miscl == 0:
            break
        delta = (
            tc.join(miscl.select(id_col), id_col)
            .groupBy("tok")
            .agg(F.sum(F.col("_y") * F.col("c")).alias("dw"))
        )
        weights = (
            weights.join(delta, "tok", "full_outer")
            .select(
                "tok",
                (
                    F.coalesce(F.col("w"), F.lit(0))
                    + F.coalesce(F.col("dw"), F.lit(0))
                ).alias("w"),
            )
        )
        if checkpoint:
            # epochs-deep lineage would re-run every prior epoch
            weights = weights.localCheckpoint()
    return weights.filter(F.col("w") != 0), history
