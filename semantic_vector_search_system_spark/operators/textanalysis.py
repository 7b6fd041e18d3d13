"""Text-analysis operators for large-scale training-data pipelines.

Beyond the reference's surface (per BASELINE.json north star): token
counting, quality scoring, language statistics, document fingerprinting.
All pure Catalyst expressions over ``array`` higher-order functions — no
Python, no shuffle except the final aggregations; each operator is a narrow
map over the corpus scan and so scales linearly to 100 TB.

Cross-engine determinism: only +,-,*,/ and integer ops (no transcendental
functions whose libm results could differ between engines), and the pinned
md5-based ``stable_hash64``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64
from ..functions.quantize import quantize
from ..functions.text import token_shingles, tokenize

STOPWORDS = ("the", "a")


def with_token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens / total_token_chars / n_stopwords columns."""
    toks = tokenize(text_col)
    return (
        df.withColumn("__toks", toks)
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .withColumn(
            "total_token_chars",
            F.aggregate("__toks", F.lit(0).cast("long"), lambda a, t: a + F.length(t)),
        )
        .withColumn(
            "n_stopwords",
            F.size(F.filter("__toks", lambda t: t.isin(*STOPWORDS))).cast("long"),
        )
        .drop("__toks")
    )


def quality_score_expr() -> Column:
    """Deterministic quality score from token stats (arithmetic only):

    ``least(1, n_tokens/100) * (1 - stopword_ratio)`` — long docs with few
    stopwords score high. Requires columns from :func:`with_token_stats`.
    """
    stop_ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens")
    return F.when(
        F.col("n_tokens") > 0,
        F.least(F.lit(1.0), F.col("n_tokens").cast("double") / 100.0) * (F.lit(1.0) - stop_ratio),
    ).otherwise(F.lit(0.0))


def doc_quality(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document quality table: token stats + ratios + score."""
    st = with_token_stats(docs.select(id_col, text_col), text_col)
    # quantize, not F.round (r10 VERDICT #2): these are ratios of token
    # counts — rationals that land EXACTLY on round()'s cross-engine-
    # divergent .5 boundaries whenever the reduced denominator carries
    # 2^5 (e.g. any doc with 32·odd tokens and an odd numerator).
    return st.select(
        id_col,
        "n_tokens",
        quantize(
            F.col("total_token_chars").cast("double") / F.col("n_tokens"), 4
        ).alias("avg_token_len"),
        quantize(
            F.col("n_stopwords").cast("double") / F.col("n_tokens"), 4
        ).alias("stopword_ratio"),
        quantize(quality_score_expr(), 4).alias("quality_score"),
    )


def token_stats_by_group(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Corpus token statistics per group (e.g. language)."""
    st = with_token_stats(docs, text_col)
    return st.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.sum("n_tokens").cast("double") / F.count("*")).alias("avg_tokens"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


def langid_confusion(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    ngram_n: int = 3,
    profile_size: int = 20,
) -> DataFrame:
    """Language-ID by character n-gram profiles, evaluated as a confusion
    matrix ``(lang, predicted, n_docs)``.

    Classic n-gram-profile heuristic (Cavnar–Trenkle style): the profile of
    each language is its top-``profile_size`` char n-grams by corpus
    frequency (ties -> lexicographic, deterministic); a document is assigned
    the language whose profile overlaps most with the doc's distinct n-grams
    (ties -> lexicographic language).

    Scale shape: n-gram explode is a narrow map; the profile is a tiny
    broadcast relation (n_langs x profile_size); classification is one
    broadcast join + per-doc argmax window. No O(n^2) anywhere.
    """
    from ..functions.text import char_ngrams
    from pyspark.sql import Window

    grams = docs.select(
        F.col(id_col), F.col(lang_col), F.explode(char_ngrams(text_col, n=ngram_n)).alias("g")
    )
    w_prof = Window.partitionBy(lang_col).orderBy(F.desc("cnt"), F.asc("g"))
    profile = (
        grams.groupBy(lang_col, "g")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rk", F.row_number().over(w_prof))
        .filter(F.col("rk") <= profile_size)
        .select(F.col(lang_col).alias("cand_lang"), "g")
    )
    doc_grams = grams.select(id_col, lang_col, "g").distinct()
    w_doc = Window.partitionBy(id_col).orderBy(F.desc("matches"), F.asc("cand_lang"))
    scored = (
        doc_grams.join(F.broadcast(profile), "g")
        .groupBy(id_col, lang_col, "cand_lang")
        .agg(F.count("*").alias("matches"))
        .withColumn("rk", F.row_number().over(w_doc))
        .filter(F.col("rk") == 1)
    )
    return (
        scored.groupBy(F.col(lang_col).alias("lang"), F.col("cand_lang").alias("predicted"))
        .agg(F.count("*").alias("n_docs"))
    )


BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_counts_regex(
    docs: DataFrame, group_col: str = "lang", text_col: str = "text"
) -> DataFrame:
    """Token counting two ways (whitespace + BPE-ish regex segmentation):
    per-group totals, exact integer sums."""
    ws = F.size(tokenize(text_col)).cast("long")
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0))).cast(
        "long"
    )
    return (
        docs.select(F.col(group_col), ws.alias("ws"), bpe.alias("bpe"))
        .groupBy(group_col)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ws").alias("ws_tokens"),
            F.sum("bpe").alias("bpe_tokens"),
        )
    )


def doc_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", shingle_n: int = 3
) -> DataFrame:
    """Winnowing-style document fingerprint: min stable-hash over token
    shingles — a single-hash MinHash, usable as a cheap near-dup key."""
    shingles = token_shingles(tokenize(text_col), n=shingle_n)
    return docs.select(
        id_col,
        F.array_min(F.transform(shingles, stable_hash64)).alias("fingerprint"),
    )


def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprint over whitespace tokens.

    Bit b of the fingerprint is 1 iff ``sum over tokens of
    (2*bit_b(stable_hash64(tok)) - 1) > 0`` (ties -> 0, deterministic).
    Expressed as explode(token) x explode(bit) -> groupBy — two narrow
    explodes and one shuffle keyed by doc id; at corpus scale the shuffle is
    map-side combined (partial sums per partition).
    """
    powers = F.array(*[F.lit(1 << b) for b in range(bits)])
    tok = docs.select(id_col, F.explode(tokenize(text_col)).alias("tok")).withColumn(
        "h", stable_hash64("tok")
    )
    bitrows = tok.select(
        id_col,
        "h",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"),
    ).select(
        id_col,
        "b",
        F.when(
            F.col("h").bitwiseAND(F.element_at(powers, F.col("b") + 1).cast("long")) != 0, F.lit(1)
        )
        .otherwise(F.lit(-1))
        .alias("sgn"),
    )
    bit_vals = bitrows.groupBy(id_col, "b").agg(
        F.when(F.sum("sgn") > 0, F.lit(1)).otherwise(F.lit(0)).alias("bit")
    )
    return bit_vals.groupBy(id_col).agg(
        F.sum(F.col("bit").cast("long") * F.element_at(powers, F.col("b") + 1)).alias("simhash")
    )
