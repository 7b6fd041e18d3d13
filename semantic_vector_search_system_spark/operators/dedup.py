"""Deduplication operators for training-data pipelines (BASELINE.json north
star): exact, MinHash+LSH, n-gram Jaccard, SimHash distance, embedding-cosine
near-dup.

Scale design (the point of each formulation):

* exact_dedup — one shuffle on a 60-bit content hash; group sizes are tiny
  (dup clusters), no skew concern. At 100 TB: hash is computed in the scan
  stage, shuffle carries (hash, id) only.
* minhash_signatures — explode(shingles) is a narrow map; the signature
  group-by is map-side combined (min is an algebraic agg), so shuffle volume
  is O(n_docs * n_hashes), independent of document length.
* lsh_candidate_pairs — banding: docs sharing any band signature become
  candidates. The only join is an equi-join on (band, band_sig) — bucketed,
  broadcast-free, and skew-safe for natural corpora (a pathological bucket
  means near-identical docs, which AQE skew-split handles).
* ngram_jaccard_pairs — exact verification for a candidate set: equi-join on
  shingle, count intersections. Pair this with LSH candidates at scale; the
  all-pairs form here is for small candidate pools only.
* embedding near-dup lives in operators/similarity.py (cosine_self_join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64
from ..functions.text import token_shingles, tokenize


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate clusters by full-content hash.

    Returns ``(text_hash, n_copies, canonical_id)`` — canonical = min id.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("canonical_id"))
    )


def shingle_sets(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Distinct token n-gram shingles per doc: ``(id, shingle)`` rows."""
    return (
        docs.select(
            F.col(id_col), F.explode(token_shingles(tokenize(text_col), n=n)).alias("shingle")
        )
        .distinct()
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature rows ``(id, seed, minhash)``, seed in [0, num_hashes).

    Hash family: ``stable_hash64(concat(seed, '#', shingle))`` — portable to
    any engine (md5-based), no salted randomness.
    """
    sh = shingle_sets(docs, id_col, text_col, n=shingle_n)
    seeds = F.explode(F.sequence(F.lit(0), F.lit(num_hashes - 1))).alias("seed")
    return (
        sh.select(F.col(id_col), seeds, F.col("shingle"))
        .select(
            F.col(id_col),
            F.col("seed").cast("long").alias("seed"),
            stable_hash64(
                F.concat(F.col("seed").cast("string"), F.lit("#"), F.col("shingle"))
            ).alias("h"),
        )
        .groupBy(id_col, "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH banding over MinHash signature rows -> candidate pairs ``(id_a, id_b)``.

    Docs collide if any band (group of ``rows_per_band`` consecutive seeds)
    has an identical signature. Pairs are distinct with ``id_a < id_b``.
    """
    banded = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("long"))
    band_sigs = (
        banded.groupBy(id_col, "band")
        .agg(F.sort_array(F.collect_list(F.struct("seed", "minhash"))).alias("sig_rows"))
        .select(
            F.col(id_col),
            F.col("band"),
            F.md5(
                F.concat_ws(",", F.transform("sig_rows", lambda r: r["minhash"].cast("string")))
            ).alias("band_sig"),
        )
    )
    a = band_sigs.select(
        F.col(id_col).alias("id_a"), F.col("band"), F.col("band_sig")
    )
    b = band_sigs.select(
        F.col(id_col).alias("id_b"), F.col("band"), F.col("band_sig")
    )
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact pairwise Jaccard similarity over distinct shingle sets.

    Returns ``(id_a, id_b, jaccard)`` for pairs sharing >= 1 shingle and
    jaccard > threshold. Intersections come from a shingle equi-join (never a
    cross join); at scale feed this a candidate-filtered corpus (LSH output).
    """
    sh = shingle_sets(docs, id_col, text_col, n=shingle_n).cache()
    counts = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") > threshold)
    )
