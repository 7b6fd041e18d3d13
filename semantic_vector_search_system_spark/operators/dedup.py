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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import stable_hash64
from ..functions.text import py_tokenize, token_shingles, tokenize


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact duplicate clusters by full-content hash.

    Returns ``(text_hash, n_copies, canonical_id)`` — canonical = min id.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_copies"), F.min(id_col).alias("canonical_id"))
    )


def normalized_exact_dedup(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup AFTER C4-style normalization (lowercase, strip
    punctuation, collapse whitespace): catches the case/punctuation
    near-copies plain :func:`exact_dedup` misses — the normalize-then-
    hash stage production pipelines run between exact and fuzzy dedup.

    Returns ``(norm_hash, n_copies, canonical_id, n_raw_variants)`` —
    canonical = min id; ``n_raw_variants`` counts the DISTINCT raw
    strings collapsing into the group (1 = plain exact-dup cluster,
    >1 = the normalization earned its keep). Same scale shape as
    exact_dedup: one hash-keyed aggregation with map-side partials; the
    distinct-count is per-group exact (bounded by group size)."""
    from ..functions.text import normalize_text

    return (
        docs.select(
            F.md5(normalize_text(F.col(text_col))).alias("norm_hash"),
            F.col(id_col),
            F.col(text_col),
        )
        .groupBy("norm_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("canonical_id"),
            F.count_distinct(text_col).alias("n_raw_variants"),
        )
    )


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    length_col: str | None = None,
) -> DataFrame:
    """URL-keyed refetch dedup — the stage crawl pipelines run BEFORE any
    content hashing (CCNet/C4/RefinedWeb all do): the same page arrives
    under many raw spellings (host case, ``www.``, default ports, trailing
    slash, tracking params, fragment, param order), and collapsing them by
    :func:`~..functions.url.canonical_url` is a pure-string keyed aggregate,
    orders of magnitude cheaper than shingling the payloads it removes.

    Returns one row per canonical URL: ``(canonical_url, n_fetches,
    n_raw_urls, kept_id)`` — ``n_raw_urls`` counts distinct raw spellings
    (1 = true refetch, >1 = the canonicalizer earned its keep); the kept
    row is the longest payload (``length_col`` desc) with min ``id_col``
    as tie-break, or plain min id when no length column is given.

    Scale shape: ONE hash-keyed aggregation — the keep-best is a
    ``min(struct(-len, id))`` declarative MIN, so map-side PARTIAL
    aggregation collapses a hot URL's refetches inside each scan partition
    before the exchange (per-reducer rows bounded by partition count, not
    refetch factor — same de-skew argument as the span-dedup keep-first).
    """
    from ..functions.url import canonical_url

    length = F.col(length_col) if length_col is not None else F.lit(0)
    base = docs.select(
        canonical_url(url_col).alias("canonical_url"),
        F.col(url_col).alias("_raw"),
        F.col(id_col).alias("_id"),
        # NULL length must LOSE to any real payload (r9 ADVICE): a null
        # struct field sorts FIRST under Spark's ascending struct MIN, so
        # an un-coalesced null -_len would beat the longest payload —
        # diverging from the documented longest-payload contract (and from
        # ORDER BY n_chars DESC NULLS LAST in the oracle)
        F.coalesce(length.cast("long"), F.lit(-1)).alias("_len"),
    )
    best = F.struct((-F.col("_len")).alias("_nl"), F.col("_id").alias("_i"))
    return (
        base.groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_fetches"),
            F.count_distinct("_raw").alias("n_raw_urls"),
            F.min(best).alias("_w"),
        )
        .select(
            "canonical_url",
            "n_fetches",
            "n_raw_urls",
            F.col("_w._i").alias("kept_id"),
        )
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

    Hash family: Kirsch–Mitzenmacher double hashing ``(h1 + seed*h2) mod
    2^60`` from ONE md5 per shingle (functions/hashing.double_hash_family) —
    portable to any engine, no salted randomness, and 8x fewer digests than
    hashing per (seed, shingle).

    Physical shape: the per-seed minima are computed as ONE wide aggregation
    (num_hashes min columns) keyed by doc id — shuffle carries one row per
    (doc, shingle), and map-side partial mins shrink it further; the
    (seed, minhash) long format is a free posexplode after the agg.
    """
    from ..functions.hashing import HASH_BITS

    # NOT distinct shingles: min over a multiset equals min over its set, so
    # the dedup shuffle shingle_sets would pay is pure waste here — the only
    # shuffle left is the doc-id agg, with map-side partial mins.
    sh = docs.select(
        F.col(id_col), F.explode(token_shingles(tokenize(text_col), n=shingle_n)).alias("shingle")
    )
    d = F.md5(F.col("shingle"))  # ONE digest; h1/h2 are substring views
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 16, 10), 16, 10).cast("long")
    mod = F.lit(1 << HASH_BITS)
    hs = [F.pmod(h1 + F.lit(i) * h2, mod) for i in range(num_hashes)]
    wide = sh.groupBy(id_col).agg(
        *[F.min(h).alias(f"mh_{i}") for i, h in enumerate(hs)]
    )
    return wide.select(
        F.col(id_col),
        F.posexplode(F.array(*[F.col(f"mh_{i}") for i in range(num_hashes)])),
    ).select(
        F.col(id_col), F.col("pos").cast("long").alias("seed"), F.col("col").alias("minhash")
    )


def minhash_signatures_fast(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
    hash_family: str = "md5",
) -> DataFrame:
    """Arrow-batched MinHash, computed per batch in numpy.

    ``hash_family="md5"`` (default) produces output identical to
    :func:`minhash_signatures` — the portable, DuckDB-reproducible family
    the oracle checks. ``hash_family="fast"`` dispatches to
    :func:`minhash_signatures_vectorized` — a different (equally valid)
    hash family whose kernel has NO per-shingle Python: use it when the
    corpus is the product and no cross-engine oracle replays the exact
    signature values (measured ~5-10x the md5 kernel; the dedup CLUSTERS
    it finds are the same up to ordinary MinHash randomness).

    Why the md5 kernel exists at all: Catalyst higher-order functions
    (transform/slice/array_join) are interpreted per element — measured
    ~77k shingles/s, vs ~1M/s for the python/numpy kernel with a
    shingle-digest memo. This is the SURVEY §4 situation (BLAS-vs-
    expression) applied to text: keep the declarative form as the spec,
    run the vectorized form in the hot path. Still a single narrow map
    stage + no shuffle at all (minima fold inside each doc's row).
    """
    if hash_family == "fast":
        return minhash_signatures_vectorized(
            docs, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n,
        )
    if hash_family != "md5":
        raise ValueError(f"unknown hash_family: {hash_family!r} (md5|fast)")
    import hashlib

    import numpy as np
    import pandas as pd

    mod = 1 << 60
    id_type = dict(docs.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, seed long, minhash long"

    def run(batches):
        memo: dict[str, tuple[int, int]] = {}

        def h12(sh: str) -> tuple[int, int]:
            v = memo.get(sh)
            if v is None:
                d = hashlib.md5(sh.encode("utf-8")).hexdigest()
                v = (int(d[:15], 16), int(d[15:25], 16))
                if len(memo) < 2_000_000:
                    memo[sh] = v
            return v

        seeds = np.arange(num_hashes, dtype=np.int64)
        for pdf in batches:
            ids, seed_out, mh_out = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                # py_tokenize, not str.split(): keeps the Java-\s+
                # class of the md5/expr family's tokenize() so the
                # two hash families see the SAME shingles on Unicode
                # whitespace (r8 ADVICE class of bug)
                toks = py_tokenize(str(txt))
                n = max(len(toks) - shingle_n + 1, 1)
                shs = {" ".join(toks[i : i + shingle_n]) for i in range(n)}
                pairs = np.array([h12(s) for s in shs], dtype=np.int64)
                hmat = (pairs[:, 0][:, None] + seeds[None, :] * pairs[:, 1][:, None]) % mod
                mins = hmat.min(axis=0)
                ids.extend([did] * num_hashes)
                seed_out.extend(range(num_hashes))
                mh_out.extend(int(x) for x in mins)
            yield pd.DataFrame({id_col: ids, "seed": seed_out, "minhash": mh_out})

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def minhash_band_signatures_fast(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
    rows_per_band: int = 2,
) -> DataFrame:
    """MinHash + LSH banding fused into ONE narrow Arrow stage:
    ``(id, band, band_sig)`` with values identical to
    ``band_signatures(minhash_signatures_fast(docs))`` (md5 family; the
    band digest is ``md5(','.join(minhash in seed order))`` exactly as the
    declarative form computes it — parity pinned by a test).

    Why fuse: the two-step form needs the signature relation twice (the
    banding self-join), forcing a checkpoint of the (id, seed, minhash)
    rows AND paying the groupBy(id, band) shuffle. This kernel emits the
    banded digests directly — zero shuffles, and the output is
    ``rows_per_band``× smaller than the signature relation, so pipelines
    checkpoint a strictly smaller artifact. At 100 TB this is the
    difference between one corpus-sized shuffle and none.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    mod = 1 << 60
    num_bands = num_hashes // rows_per_band
    id_type = dict(docs.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, band long, band_sig string"

    def run(batches):
        memo: dict[str, tuple[int, int]] = {}

        def h12(sh: str) -> tuple[int, int]:
            v = memo.get(sh)
            if v is None:
                d = hashlib.md5(sh.encode("utf-8")).hexdigest()
                v = (int(d[:15], 16), int(d[15:25], 16))
                if len(memo) < 2_000_000:
                    memo[sh] = v
            return v

        seeds = np.arange(num_hashes, dtype=np.int64)
        for pdf in batches:
            ids, band_out, sig_out = [], [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                # py_tokenize, not str.split(): keeps the Java-\s+
                # class of the md5/expr family's tokenize() so the
                # two hash families see the SAME shingles on Unicode
                # whitespace (r8 ADVICE class of bug)
                toks = py_tokenize(str(txt))
                n = max(len(toks) - shingle_n + 1, 1)
                shs = {" ".join(toks[i : i + shingle_n]) for i in range(n)}
                pairs = np.array([h12(s) for s in shs], dtype=np.int64)
                hmat = (pairs[:, 0][:, None] + seeds[None, :] * pairs[:, 1][:, None]) % mod
                mins = hmat.min(axis=0)
                for b in range(num_bands):
                    chunk = mins[b * rows_per_band : (b + 1) * rows_per_band]
                    digest = hashlib.md5(
                        ",".join(str(int(m)) for m in chunk).encode("utf-8")
                    ).hexdigest()
                    ids.append(did)
                    band_out.append(b)
                    sig_out.append(digest)
            yield pd.DataFrame({id_col: ids, "band": band_out, "band_sig": sig_out})

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def lsh_candidate_pairs_from_bands(
    band_sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Clique candidate pairs from a precomputed ``(id, band, band_sig)``
    relation (see :func:`minhash_band_signatures_fast`) — the join half of
    :func:`lsh_candidate_pairs` without re-deriving the band digests."""
    a = band_sigs.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = band_sigs.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_signatures_vectorized(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash with a fully vectorized token-hash family — the 100 TB
    throughput kernel (`hash_family="fast"`).

    Design: instead of hashing every shingle STRING (per-shingle Python
    call + md5 ≈ 3 µs each — the md5 kernel's entire cost), hash each
    distinct TOKEN once and combine ``shingle_n`` consecutive token hashes
    arithmetically into a shingle hash:

    * tokenization and flattening: ``pyarrow.compute.ascii_split_whitespace``
      (C; the ASCII class == Java regex ``\\s`` == ``functions.text.
      tokenize`` — NOT ``utf8_split_whitespace``/``str.split()``, whose
      Unicode classes also split on NBSP et al. and would give this family
      different shingles than the md5/expr family on real web text);
    * token hashing: ``dictionary_encode`` then ``pandas.util.hash_array``
      over the DICTIONARY only — Zipf-distributed corpora have few distinct
      tokens per batch, so the only per-string work left is O(vocabulary);
    * shingle hash: one odd-constant positional linear combine of the
      window's token hashes in wrapping uint64 (position-sensitive, so
      permuted windows differ);
    * per-seed value: splitmix64 finalizer over ``H + (seed+1)*GAMMA`` —
      a NON-LINEAR mix per seed. Kirsch–Mitzenmacher ``h1 + seed*h2`` is
      linear in the seed, so the globally-minimal shingle at seed s tends
      to stay minimal at s+1..s+r-1: on a small-vocabulary corpus every
      popular shingle sits in thousands of docs, and one persistently-
      minimal shingle put ~750 UNRELATED docs into the same 4-seed band
      bucket (measured at 1M docs). The finalizer makes seeds
      independent, restoring the J^r band-collision probability;
    * per-doc minima: one ``np.minimum.reduceat`` per seed over the flat
      window array — no per-doc numpy calls.

    Determinism: ``hash_array`` uses a pinned key and depends only on token
    bytes, so signatures are stable across runs, partitionings and batch
    boundaries (windows never cross documents — neighbor positions from
    other docs are masked). NOT portable to other engines by design; use
    the md5 family when an external oracle must replay signatures.

    Output schema matches :func:`minhash_signatures`: ``(id, seed,
    minhash)`` with minhash in [0, 2^60) (values differ — different
    family). Same LSH banding / clustering applies downstream.
    """
    import numpy as np
    import pandas as pd

    id_type = dict(docs.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, seed long, minhash long"
    batch_minima = _fast_minima_kernel(text_col, num_hashes, shingle_n)

    def run(batches):
        for pdf in batches:
            mins = batch_minima(pdf)  # (n_docs, num_hashes) uint64
            n_docs = mins.shape[0]
            ids = np.repeat(pdf[id_col].to_numpy(), num_hashes)
            seeds_out = np.tile(np.arange(num_hashes, dtype=np.int64), n_docs)
            yield pd.DataFrame(
                {id_col: ids, "seed": seeds_out,
                 "minhash": mins.reshape(-1).astype(np.int64)}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def _fast_minima_kernel(text_col: str, num_hashes: int, shingle_n: int):
    """Batch kernel of the fast MinHash family: returns a function mapping
    a pandas batch to its ``(n_docs, num_hashes)`` uint64 minima matrix.
    Shared by :func:`minhash_signatures_vectorized` (long-format output)
    and :func:`minhash_band_signatures_vectorized` (fused banding), so the
    two can never diverge on signature values."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    # distinct odd 64-bit constants (golden-ratio / xxHash-style primes)
    P = np.array([0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                  0x27D4EB2F165667C5, 0x9E3779B97F4A7C15], dtype=np.uint64)
    if shingle_n > len(P):
        raise ValueError(f"shingle_n up to {len(P)} supported in the fast family")
    M60 = np.uint64((1 << 60) - 1)
    SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
    GAMMA = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 stream increment
    with np.errstate(over="ignore"):  # wrapping uint64 intended
        SEED_OFF = np.arange(1, num_hashes + 1, dtype=np.uint64) * GAMMA

    def batch_minima(pdf) -> "np.ndarray":
        texts = pa.array(pdf[text_col].fillna("").astype(str))
        toks = pc.ascii_split_whitespace(texts)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        lens0 = offsets[1:] - offsets[:-1]
        n_docs = len(lens0)
        enc = pc.dictionary_encode(toks.values)
        codes0 = np.asarray(enc.indices, dtype=np.int64)
        vocab = enc.dictionary.to_pandas().to_numpy(dtype=object)
        # arrow's split emits empty tokens at edges/runs (str.split()
        # does not): drop them and rebuild per-doc boundaries
        did0 = np.repeat(np.arange(n_docs, dtype=np.int64), lens0)
        keep = np.asarray(pc.utf8_length(toks.values), dtype=np.int64) > 0
        codes = codes0[keep]
        did = did0[keep]
        lens = np.bincount(did, minlength=n_docs).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        th = pd.util.hash_array(vocab).astype(np.uint64)[codes]

        n = len(th)
        h = np.zeros(n, dtype=np.uint64)
        valid = np.ones(n, dtype=bool)
        pos = np.arange(n, dtype=np.int64)
        for j in range(shingle_n):
            tj = np.empty(n, dtype=np.uint64)
            tj[: n - j] = th[j:]
            tj[n - j :] = 0
            inside = np.empty(n, dtype=bool)
            inside[: n - j] = did[j:] == did[: n - j]
            inside[n - j :] = False
            # tokens outside the doc contribute 0 (short docs still get
            # a content-only hash, mirroring the md5 kernel's
            # max(len - shingle_n + 1, 1) single short shingle)
            h = h + np.where(inside, tj, np.uint64(0)) * P[j]
            if j > 0:
                # a window START is valid while the previous start was,
                # OR it is the doc's first (short-doc) window
                valid &= inside | (pos == starts[did])

        mins = np.empty((n_docs, num_hashes), dtype=np.uint64)
        if n == 0:
            mins[:] = 0
        else:
            # reduceat quirk: an empty segment returns the element AT
            # the start index; zero-token docs are fixed below
            red_starts = np.minimum(starts, n - 1)
            for s in range(num_hashes):
                v = np.where(
                    valid, _mix64(h + SEED_OFF[s]) & M60, SENTINEL
                )
                mins[:, s] = np.minimum.reduceat(v, red_starts)
        # zero-token docs: the H=0 empty window (what the loop above
        # yields when every position is outside the doc — the fast
        # family's analog of the md5 kernel's single "" shingle)
        if n_docs and (lens == 0).any():
            mins[lens == 0, :] = _mix64(SEED_OFF) & M60
        return mins

    return batch_minima


def _mix64(x):
    """splitmix64 finalizer (vectorized, wrapping uint64)."""
    import numpy as np

    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def minhash_band_signatures_vectorized(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle_n: int = 3,
    rows_per_band: int = 4,
    with_minima: bool = False,
) -> DataFrame:
    """Fast-family MinHash + banding fused into ONE narrow Arrow stage:
    ``(id, band, band_sig)`` with ``band_sig`` a 64-bit arithmetic digest
    of the band's minima (positional odd-constant combine + splitmix64 —
    vectorized, no per-row hashing).

    The fast-family twin of :func:`minhash_band_signatures_fast`: two docs
    share a ``band_sig`` iff their ``rows_per_band`` minima for that band
    are all equal (up to a ~2^-64 digest collision — negligible against
    MinHash's own false-positive rate, and the verify stage kills any
    stray edge anyway). Minima come from the SAME kernel as
    :func:`minhash_signatures_vectorized` (`_fast_minima_kernel`), so
    band collisions here equal band collisions of the two-step form —
    parity-tested — while skipping BOTH the 16-rows-per-doc long format
    and the ``groupBy(id, band)`` shuffle it feeds. At 1M docs that is
    the dominant cost of the dedup pipeline's first stage.

    ``with_minima=True`` additionally emits each band's raw minima as an
    ``array<long>`` column, so a consumer that needs BOTH the band digests
    (candidates) and the signature values (agreement) — incremental dedup
    serving — runs the minima kernel ONCE and derives the long-format
    signature rows with a free ``posexplode`` (seed = band*rows_per_band
    + pos) instead of a second pass over the text.
    """
    import numpy as np
    import pandas as pd

    if num_hashes % rows_per_band:
        raise ValueError("num_hashes must be a multiple of rows_per_band")
    num_bands = num_hashes // rows_per_band
    id_type = dict(docs.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, band long, band_sig long"
    if with_minima:
        schema += ", minima array<long>"
    batch_minima = _fast_minima_kernel(text_col, num_hashes, shingle_n)
    # distinct odd multipliers per within-band position, and a per-band
    # stream offset, so (band, values) -> digest is position- and
    # band-sensitive
    GAMMA = np.uint64(0x9E3779B97F4A7C15)
    with np.errstate(over="ignore"):
        POS_MULT = (
            np.arange(1, rows_per_band + 1, dtype=np.uint64)
            * np.uint64(0xC2B2AE3D27D4EB4F)
            | np.uint64(1)
        )
        BAND_OFF = np.arange(1, num_bands + 1, dtype=np.uint64) * GAMMA

    def run(batches):
        for pdf in batches:
            mins = batch_minima(pdf)  # (n_docs, num_hashes)
            n_docs = mins.shape[0]
            with np.errstate(over="ignore"):
                # (n_docs, num_bands, rows_per_band) -> positional combine
                chunks = mins.reshape(n_docs, num_bands, rows_per_band)
                acc = (chunks * POS_MULT[None, None, :]).sum(
                    axis=2, dtype=np.uint64
                )
                digs = _mix64(acc + BAND_OFF[None, :])
            ids = np.repeat(pdf[id_col].to_numpy(), num_bands)
            bands = np.tile(np.arange(num_bands, dtype=np.int64), n_docs)
            out = {
                id_col: ids,
                "band": bands,
                "band_sig": digs.reshape(-1).astype(np.int64),
            }
            if with_minima:
                flat = chunks.reshape(n_docs * num_bands, rows_per_band).astype(
                    np.int64
                )
                out["minima"] = list(flat)
            yield pd.DataFrame(out)

    return docs.select(id_col, text_col).mapInPandas(run, schema)


def lsh_bucket_edges_from_bands(
    band_sigs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Star edges from a precomputed ``(id, band, band_sig)`` relation —
    the window-min half of :func:`lsh_bucket_edges` without re-deriving
    band digests (pair with either fused banding kernel)."""
    w = Window.partitionBy("band", "band_sig")
    starred = band_sigs.select(
        F.min(id_col).over(w).alias("id_a"), F.col(id_col).alias("id_b")
    )
    return starred.filter(F.col("id_a") != F.col("id_b")).distinct()


def band_signatures(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 2,
) -> DataFrame:
    """Per-(doc, band) signature digests ``(id, band, band_sig)``: docs
    sharing any ``band_sig`` within a band are LSH candidates."""
    banded = signatures.withColumn("band", (F.col("seed") / rows_per_band).cast("long"))
    return (
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


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 2,
) -> DataFrame:
    """LSH banding over MinHash signature rows -> candidate pairs ``(id_a, id_b)``.

    Docs collide if any band (group of ``rows_per_band`` consecutive seeds)
    has an identical signature. Pairs are distinct with ``id_a < id_b``.

    Emits the full per-bucket clique — O(bucket²) pairs — which is what a
    verify stage (ngram_jaccard_pairs on candidates) needs. For pipelines
    that go straight to clustering, :func:`lsh_bucket_edges` produces an
    equivalent-connectivity edge set at O(bucket) cost instead.
    """
    band_sigs = band_signatures(signatures, id_col, rows_per_band)
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


def lsh_bucket_edges(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 2,
) -> DataFrame:
    """Star edges per LSH bucket: ``(id_a=bucket_min_id, id_b=member)``.

    The 100 TB dedup path. A bucket of b near-identical docs yields b-1
    edges instead of b(b-2)/2 pairs — a 10k-copy boilerplate cluster
    becomes 9,999 edges, not ~50M — while :func:`connected_components`
    over star edges produces EXACTLY the same components as over the full
    clique (every member connects to the bucket minimum, and shared
    members chain buckets together transitively, as in the clique form).
    This is the standard production MinHash-dedup shape (bucket -> union-
    find on members, no pairwise materialization).

    Physical plan: one window min over (band, band_sig) — a single hash
    shuffle of the band-signature rows, no join at all. Trade-off vs
    :func:`lsh_candidate_pairs`: no per-pair similarity is available, so
    use this when bucket collision IS the dedup criterion (tuned
    num_hashes/rows_per_band), and the clique form when a Jaccard-verify
    stage filters candidates first.
    """
    band_sigs = band_signatures(signatures, id_col, rows_per_band)
    return lsh_bucket_edges_from_bands(band_sigs, id_col)


def _shingle_hash_sets_arrow(
    sub: DataFrame, id_col: str, text_col: str, shingle_n: int
) -> DataFrame:
    """Per-doc distinct shingle-hash sets ``(id, shs array<long>)`` as an
    Arrow batch kernel — the hot-path twin of the declarative HOF
    projection in :func:`verify_candidate_edges` (kernel="expr"). Uses the
    same md5-prefix hash family and digest memo as
    :func:`minhash_signatures_fast`."""
    import hashlib

    import pandas as pd

    id_type = dict(sub.dtypes)[id_col]
    schema = f"`{id_col}` {id_type}, shs array<long>"

    def run(batches):
        memo: dict[str, int] = {}

        def h(sh: str) -> int:
            v = memo.get(sh)
            if v is None:
                v = int(hashlib.md5(sh.encode("utf-8")).hexdigest()[:15], 16)
                if len(memo) < 2_000_000:
                    memo[sh] = v
            return v

        for pdf in batches:
            ids, arrs = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                # py_tokenize, not str.split(): keeps the Java-\s+
                # class of the md5/expr family's tokenize() so the
                # two hash families see the SAME shingles on Unicode
                # whitespace (r8 ADVICE class of bug)
                toks = py_tokenize(str(txt))
                n = max(len(toks) - shingle_n + 1, 1)
                shs = {" ".join(toks[i : i + shingle_n]) for i in range(n)}
                ids.append(did)
                arrs.append([h(s) for s in shs])
            yield pd.DataFrame({id_col: ids, "shs": arrs})

    return sub.select(id_col, text_col).mapInPandas(run, schema)


def verify_candidate_edges(
    docs: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    threshold: float = 0.7,
    broadcast_edges: bool = True,
    kernel: str = "expr",
) -> DataFrame:
    """Exact n-gram Jaccard verification of LSH candidate edges — the
    verify stage between banding and clustering. Returns the surviving
    edges ``(id_a, id_b, jaccard)`` with ``jaccard >= threshold``.

    Why not :func:`ngram_jaccard_pairs` here: its shingle equi-join
    recomputes ALL pairs sharing a shingle — a b-member bucket of
    near-identical docs costs O(b²) join rows per shingle. This verifier
    instead scores exactly the edges it is given: per-doc shingle-hash
    sets are built only for docs appearing in an edge (semi-join
    pushdown), then each edge costs one ``array_intersect`` over two
    doc-length-bounded arrays. Verifying a b-member bucket's star edges
    is O(b · doc_len) — immune to the bucket-size blowup.

    Scale shape: two equi-joins of the edge list against the shingle-array
    relation (shuffle on doc id; each row carries one bounded array), one
    narrow projection. False-positive bucket collisions — which grow with
    C(n,2) even when per-pair probability is J^r — die here instead of
    chaining unrelated docs into one component.

    Caller note: ``edges`` is consumed twice (id semi-join + the edge
    join); if it carries an expensive lineage (an LSH banding DAG),
    cache/checkpoint it first or the signature pass re-executes.

    ``kernel`` selects the shingle-hash projection implementation:
    ``"expr"`` (default) is the declarative HOF + xxhash64 form — at
    small-to-medium edge counts it wins because the pruned subset stays
    JVM-side and both verify joins remain broadcast probes. ``"arrow"``
    computes per-doc shingle-hash sets in a mapInPandas batch kernel
    (md5-prefix hashes with a digest memo, the same family as
    :func:`minhash_signatures_fast`) — measured SLOWER at sf0.1 (python
    worker spin-up + lost size estimates demote the probe joins), kept for
    corpora where per-element HOF interpretation dominates. Both are
    exact: Jaccard over distinct hashed shingles equals Jaccard over
    distinct shingles absent a 60/64-bit collision, and the kernels are
    cross-checked in tests.
    """
    # Default plan (broadcast_edges=True): the edge list is small by
    # construction (O(duplicate pairs) after banding), so broadcast it —
    # the semi-join prunes the doc scan in place and both verify joins are
    # broadcast-hash probes of narrow map stages: zero exchanges of
    # doc-sized data regardless of corpus size. The annotated edge relation
    # (edges + one side's shingle arrays, O(edges · doc_len)) is itself
    # broadcast for the second probe; for edge lists too big for that —
    # beyond ~1M verified-duplicate pairs — pass broadcast_edges=False to
    # fall back to shuffle hash joins keyed by doc id.
    ids = (
        edges.select(F.col("id_a").alias(id_col))
        .union(edges.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    maybe_b = F.broadcast if broadcast_edges else (lambda df: df)
    # Repartition the pruned subset before the shingle-hash projection: the
    # projection is the CPU-heavy stage and must not inherit the input's
    # split count (a small parquet scans as ONE partition locally — measured
    # 2.8 s single-task vs 0.36 s at 16 tasks for the same 5k docs). One
    # exchange of pruned text only; at cluster scale it also rebalances the
    # possibly-skewed edge-incident subset across executors.
    nparts = docs.sparkSession.sparkContext.defaultParallelism
    sub = docs.join(maybe_b(ids), id_col, "left_semi").repartition(nparts)
    if kernel == "arrow":
        arrs = _shingle_hash_sets_arrow(sub, id_col, text_col, shingle_n)
    elif kernel == "expr":
        # Shingle-hash set per doc as ONE narrow projection (HOF transform +
        # array_distinct) — no explode, no (id, shingle) shuffle, no
        # collect_set aggregation. Hash-then-distinct equals the former
        # distinct-then-hash-then-collect_set: any xxhash64 collision merged
        # in the set either way.
        arrs = sub.select(
            F.col(id_col),
            F.array_distinct(
                F.transform(
                    token_shingles(tokenize(text_col), n=shingle_n),
                    lambda s: F.xxhash64(s),
                )
            ).alias("shs"),
        )
    else:
        raise ValueError(f"unknown kernel: {kernel!r} (arrow|expr)")
    ea = arrs.select(F.col(id_col).alias("id_a"), F.col("shs").alias("shs_a"))
    eb = arrs.select(F.col(id_col).alias("id_b"), F.col("shs").alias("shs_b"))
    n_inter = F.size(F.array_intersect("shs_a", "shs_b"))
    n_union = F.size("shs_a") + F.size("shs_b") - n_inter
    half = ea.join(maybe_b(edges.select("id_a", "id_b")), "id_a")
    # Threshold as an EXACT integer rational comparison (r10 VERDICT #2):
    # the former `ROUND(i/u, 4) >= t` flips cross-engine at exact .5
    # boundaries (Spark BigDecimal HALF_UP on the shortest repr vs
    # DuckDB scaled-double std::round) — and i/u over small integers
    # lands on such boundaries with real probability, silently changing
    # the ROW SET. `round4(i/u) >= t` ⟺ `20000·i >= (2·t·10⁴ − 1)·u`
    # in exact int64 arithmetic — identical semantics, no float, no
    # engine divergence. The emitted jaccard column is the UNROUNDED
    # IEEE quotient: both engines divide the same two integers, so the
    # doubles are bit-identical.
    thr4 = int(round(threshold * 10000))
    keep = (F.lit(20000).cast("long") * n_inter) >= (
        F.lit(2 * thr4 - 1).cast("long") * n_union
    )
    return (
        half.join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            (n_inter.cast("double") / n_union).alias("jaccard"),
            keep.alias("_keep"),
        )
        .filter(F.col("_keep"))
        .drop("_keep")
    )


def connected_components(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
    small_edge_threshold: int = 1_000_000,
    degree_cap: int | None = None,
    n_salts: int = 16,
) -> DataFrame:
    """Connected components of an undirected pair graph (the step that turns
    near-dup *pairs* into dedup *clusters*). Returns ``(node, component)``
    where ``component`` is the smallest node id in the component —
    deterministic under any partitioning.

    Mirrors the reference's implicit "a pair means the docs are duplicates"
    semantics (it never clusters because it only ever evaluates pairwise);
    clustering is what a keep-one-copy training pipeline actually needs.

    Two physical strategies behind one result:

    * **small graphs (≤ ``small_edge_threshold`` edges)**: collect the edge
      list and union-find on the driver. A verified dedup edge list is
      O(duplicate pairs) — tiny relative to the corpus even at 100 TB (the
      1M-doc bench corpus with 18k planted dups yields ~18k edges) — and
      the iterative path pays ~5 scheduled jobs per round, which dominates
      wall-clock for small graphs. Union-by-min-root makes every tree root
      the component minimum, so labels match the distributed path exactly.

      Driver-memory note: deciding the strategy materializes up to
      ``small_edge_threshold + 1`` edges on the driver — as an Arrow table
      (two id columns, ~16 B/edge for int64 ids, so ~16 MB at the 1 M
      default), NOT per-row ``Row`` objects. On a driver-memory-constrained
      deployment lower the threshold, or pass ``small_edge_threshold=0``
      to skip the probe entirely and always run the distributed path.
    * **large graphs**: min-label propagation with pointer jumping. Each
      round is (a) one equi-join of the edge list with the current labels +
      a min-aggregation keyed by node, then (b) one self-join that replaces
      every label by its label's label. (a) alone converges in
      graph-diameter rounds; (b) collapses chains exponentially, so rounds
      ~ O(log diameter). Lineage is truncated per round with
      ``localCheckpoint`` (on a cluster, prefer a reliable checkpoint dir);
      the edge list is cached once and reused. Early-exits via one tiny
      limit(1) probe per round.

    **High-degree skew** (r8 VERDICT #3): a boilerplate hub — one chunk or
    band shared by 30% of the corpus — makes a star whose center appears
    in O(n) edges, so both per-round joins put every hub row in ONE task:
    the propagate join keys on ``src`` (hot = high-degree node) and the
    pointer jump keys on ``comp`` (hot = mega-component label).  The
    min-AGGREGATIONS after them are already safe (map-side partial
    combine), and AQE's skew-split handles moderate skew at runtime; for
    the guaranteed bound, pass ``degree_cap``: nodes with degree >
    ``degree_cap`` (a static, once-computed set) get their edges salted
    across ``n_salts`` sub-keys with the label row replicated per salt,
    and each round's jump replicates the mapping row of any label held by
    > ``degree_cap`` nodes the same way (the hot-label set is a tiny
    per-round aggregate, broadcast).  Any single join task then holds at
    most ~``degree/n_salts`` hub rows — the two-phase de-skew shape the
    span-dedup keep-first aggregate established.  Labels are
    bitwise-identical with the unsalted path (min is associative and
    commutative; parity-tested on a planted mega-star).
    """
    spark = pairs.sparkSession
    if small_edge_threshold > 0:
        # limit(threshold+1) + Arrow collect instead of a separate count():
        # one pass decides the strategy AND delivers the small-graph edges,
        # in columnar buffers (~16 B/edge) rather than driver Row objects.
        probe_tbl = (
            pairs.select(src_col, dst_col).limit(small_edge_threshold + 1).toArrow()
        )
        if probe_tbl.num_rows <= small_edge_threshold:
            srcs = probe_tbl.column(0).to_pylist()
            dsts = probe_tbl.column(1).to_pylist()
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            for a, b in zip(srcs, dsts):
                ra, rb = find(a), find(b)
                if ra != rb:
                    if rb < ra:
                        ra, rb = rb, ra
                    parent[rb] = ra  # root := min ⇒ root IS the component min
            nodes = set(srcs)
            nodes.update(dsts)
            node_t = dict(pairs.dtypes)[src_col]
            return spark.createDataFrame(
                [(n, find(n)) for n in sorted(nodes)],
                f"node {node_t}, component {node_t}",
            )
    edges = (
        pairs.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(pairs.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    hot_src = None
    if degree_cap is not None:
        # static: degrees never change across rounds. Hot srcs are the
        # few hubs — broadcast-joined onto the edge relation ONCE, each
        # hot edge salted by its dst so the per-(src, salt) groups are
        # ~degree/n_salts.
        hot_src = (
            edges.groupBy("src")
            .agg(F.count("*").alias("_deg"))
            .filter(F.col("_deg") > degree_cap)
            .select("src")
            .withColumn("_hot", F.lit(True))
            .localCheckpoint()
        )
        edges = edges.join(F.broadcast(hot_src), "src", "left").select(
            "src",
            "dst",
            F.when(
                F.col("_hot").isNotNull(), F.pmod(F.xxhash64("dst"), F.lit(n_salts))
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("_salt"),
        )
    edges = edges.cache()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    salts = F.sequence(F.lit(0), F.lit(n_salts - 1))

    for _ in range(max_iterations):
        # (a) propagate: comp(n) <- min(comp(n), min over neighbours m comp(m))
        lab_src = labels.withColumnRenamed("node", "src")
        if degree_cap is None:
            joined = edges.join(lab_src, "src")
        else:
            # replicate ONLY the hot srcs' label rows across the salts;
            # every (src, _salt) edge group meets exactly one label row
            lab_exp = (
                lab_src.join(F.broadcast(hot_src), "src", "left")
                .select(
                    "src",
                    "comp",
                    F.explode(
                        F.when(F.col("_hot").isNotNull(), salts).otherwise(
                            F.array(F.lit(0))
                        )
                    ).alias("_salt"),
                )
            )
            joined = edges.join(lab_exp, ["src", "_salt"])
        neigh = joined.groupBy(F.col("dst").alias("node")).agg(
            F.min("comp").alias("ncomp")
        )
        prop = labels.join(neigh, "node", "left").select(
            "node", F.least("comp", F.coalesce("ncomp", "comp")).alias("comp")
        )
        # (b) pointer jump: comp(n) <- comp(comp(n)) (labels only decrease,
        # and every label is itself a node id, so the lookup always hits)
        mapping = prop.select(F.col("node").alias("m_node"), F.col("comp").alias("m_comp"))
        if degree_cap is None:
            jumped = (
                prop.join(mapping, prop["comp"] == mapping["m_node"], "left")
                .select("node", F.coalesce("m_comp", "comp").alias("comp"))
                .localCheckpoint()
            )
        else:
            # per-round hot LABELS (mega-components forming): tiny agg —
            # map-side combined, keyed by comp — then the same replicate-
            # small-side/salt-big-side split as the propagate join
            hot_lab = (
                prop.groupBy("comp")
                .agg(F.count("*").alias("_n"))
                .filter(F.col("_n") > degree_cap)
                .select("comp")
                .withColumn("_hot", F.lit(True))
            )
            prop_s = prop.join(F.broadcast(hot_lab), "comp", "left").select(
                "node",
                "comp",
                F.when(
                    F.col("_hot").isNotNull(),
                    F.pmod(F.xxhash64("node"), F.lit(n_salts)),
                )
                .otherwise(F.lit(0))
                .cast("int")
                .alias("_s"),
            )
            map_exp = (
                mapping.join(
                    F.broadcast(hot_lab.withColumnRenamed("comp", "m_node")),
                    "m_node",
                    "left",
                )
                .select(
                    "m_node",
                    "m_comp",
                    F.explode(
                        F.when(F.col("_hot").isNotNull(), salts).otherwise(
                            F.array(F.lit(0))
                        )
                    ).alias("_s"),
                )
            )
            jumped = (
                prop_s.join(
                    map_exp,
                    (prop_s["comp"] == map_exp["m_node"])
                    & (prop_s["_s"] == map_exp["_s"]),
                    "left",
                )
                .select("node", F.coalesce("m_comp", "comp").alias("comp"))
                .localCheckpoint()
            )
        changed = (
            jumped.join(labels.withColumnRenamed("comp", "old"), "node")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = jumped
        if changed == 0:
            break
    edges.unpersist()
    return labels.select("node", F.col("comp").alias("component"))


def neardup_clusters(
    pairs: DataFrame,
    src_col: str = "id_a",
    dst_col: str = "id_b",
) -> DataFrame:
    """Cluster near-duplicate candidate pairs and pick a canonical doc per
    cluster. Returns ``(doc_id, cluster_id, n_members, is_canonical)`` —
    ``cluster_id`` = min doc id in the component, ``is_canonical`` marks the
    one row per cluster a keep-one-copy dedup retains."""
    comp = connected_components(pairs, src_col=src_col, dst_col=dst_col)
    sizes = comp.groupBy("component").agg(F.count("*").alias("n_members"))
    return (
        comp.join(F.broadcast(sizes), "component")
        .select(
            F.col("node").alias("doc_id"),
            F.col("component").alias("cluster_id"),
            "n_members",
            (F.col("node") == F.col("component")).alias("is_canonical"),
        )
    )


def incremental_new_docs(
    new_docs: DataFrame,
    index: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-ingest dedup: rows of ``new_docs`` whose content hash is
    absent from the existing ``index`` (which must carry a ``text_hash``
    column, e.g. produced by :func:`exact_dedup` or stored alongside the
    vector index).

    Left-anti join on the 60-bit content hash — the P7 memoization shape
    applied to corpus growth; at 100 TB the index side is a hash-bucketed
    table so the anti-join is shuffle-free on matching bucketing.
    """
    hashed = new_docs.withColumn("text_hash", F.md5(F.col(text_col)))
    return hashed.join(index.select("text_hash"), "text_hash", "left_anti").drop("text_hash")


def incremental_neardup(
    new_docs: DataFrame,
    corpus_sigs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    threshold: float = 0.5,
    shingle_n: int = 3,
    hash_family: str = "md5",
    corpus_bands: DataFrame | None = None,
    corpus_hash_family: str | None = None,
) -> DataFrame:
    """Incremental NEAR-dup: dedup a NEW batch against an EXISTING corpus
    using only the corpus' STORED MinHash signatures — the daily-crawl-
    versus-100TB-corpus shape, where re-reading (or even re-shingling) the
    corpus text per batch is off the table.

    Returns one row per new doc: ``(id, is_dup, matched_id, est_jaccard)``
    — ``matched_id`` is the corpus doc with the highest signature-agreement
    estimate (ties broken by ascending id), ``est_jaccard`` = fraction of
    the ``num_hashes`` seeds whose minima agree (the standard unbiased
    MinHash Jaccard estimator), ``is_dup`` iff that estimate reaches
    ``threshold``.  Non-duplicate rows keep null match columns.

    Scale shape (everything the batch pipeline's LSH already proved):

    * the corpus contributes ``num_hashes`` signature rows per doc — the
      stored index produced once by :func:`minhash_signatures_fast` at
      ingest (and appended to as batches are accepted);
    * candidates come from a band equi-join (new bands x corpus bands),
      never any-to-all; at 100 TB bucket/partition the signature table by
      ``(band, band_sig)`` and the join is co-located;
    * the agreement estimate joins signatures only for candidate edges —
      ``O(edges x num_hashes)`` — followed by a per-new-doc argmax window
      over the (tiny) qualifying-edge relation;
    * the physical plan (verified): new bands and candidate edges
      BROADCAST, the corpus signature/band relations are only SCANNED and
      probed — never shuffled. Per-batch IO is therefore the signature
      index (``num_hashes x 8`` bytes per corpus doc ≈ 1000x smaller than
      the text it summarizes), the precise reason signatures are stored.

    The estimator is relational end-to-end, so the catalog oracle replays
    it exactly in DuckDB (``hash_family='md5'``); use ``'fast'`` only when
    no cross-engine replay of signature values is needed.  ``corpus_sigs``
    must come from the SAME hash family — declare the stored index's family
    via ``corpus_hash_family`` (read_neardup_index returns it from the
    index metadata) and a mismatch fails loudly instead of silently
    estimating jaccard 0.

    ``corpus_bands`` — a prebuilt ``(id, band, band_sig)`` relation for
    the corpus — is the stored-index serving shape: at ingest time a
    pipeline persists BOTH the signature rows (for agreement) and the
    band digests (for candidates), so per-batch cost never re-bands the
    corpus (a corpus-sized shuffle otherwise).  When omitted, bands are
    derived from ``corpus_sigs`` on the fly (fine at test scale).
    """
    # Band digests AND minima must come from the SAME hash family on both
    # sides — md5(concat-of-minima) strings (band_signatures, any family)
    # or the fused arithmetic splitmix64 longs
    # (minhash_band_signatures_vectorized) — or the candidate equi-join /
    # agreement join compares incomparable values and silently estimates
    # jaccard 0 for exact copies.  The authoritative check is the EXPLICIT
    # ``corpus_hash_family`` declaration (stored-index metadata carries it —
    # see write_neardup_index/read_neardup_index); the band_sig dtype sniff
    # below remains as a backstop for long-dtype fast digests, which are
    # detectable structurally (md5-vs-sha mismatches are not: both minima
    # families produce bigint minima, indistinguishable by schema).
    if corpus_hash_family is not None and corpus_hash_family != hash_family:
        raise ValueError(
            "incremental_neardup: corpus index was built with hash_family="
            f"{corpus_hash_family!r} but the new batch uses "
            f"hash_family={hash_family!r} — signature minima from different "
            "families never agree, so every agreement estimate would be 0. "
            "Re-sign the batch with the corpus' family."
        )
    fast_bands = corpus_bands is not None and dict(corpus_bands.dtypes)[
        "band_sig"
    ] in ("bigint", "long")
    if fast_bands and hash_family != "fast":
        # a long-dtype band index was built with the fast-family kernels;
        # comparing md5-family new minima against it would silently return
        # est_jaccard 0 for EXACT copies — fail loudly instead
        raise ValueError(
            "incremental_neardup: corpus_bands carries fast-family arithmetic "
            "digests (band_sig long) — pass hash_family='fast' (and "
            "fast-family corpus_sigs)"
        )
    if fast_bands:
        # ONE minima pass over the new batch serves both relations: band
        # digests for candidates, posexplode of the per-band minima for
        # agreement (seed = band*rows_per_band + pos). The tiny combined
        # relation is checkpointed so the two consumers don't re-run the
        # kernel.
        nbm = minhash_band_signatures_vectorized(
            new_docs, id_col=id_col, text_col=text_col,
            num_hashes=num_hashes, shingle_n=shingle_n,
            rows_per_band=rows_per_band, with_minima=True,
        ).localCheckpoint()
        new_bands = nbm.select(id_col, "band", "band_sig")
        new_sigs = nbm.select(
            F.col(id_col), F.col("band"), F.posexplode("minima")
        ).select(
            F.col(id_col),
            (F.col("band") * rows_per_band + F.col("pos")).cast("long").alias("seed"),
            F.col("col").alias("minhash"),
        )
    else:
        new_sigs = minhash_signatures_fast(
            new_docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            shingle_n=shingle_n, hash_family=hash_family,
        )
        new_bands = band_signatures(new_sigs, id_col, rows_per_band)
        if corpus_bands is None:
            corpus_bands = band_signatures(corpus_sigs, id_col, rows_per_band)
    nb = new_bands.select(F.col(id_col).alias("__new_id"), "band", "band_sig")
    cb = corpus_bands.select(
        F.col(id_col).alias("__old_id"), "band", "band_sig"
    )
    cands = nb.join(cb, ["band", "band_sig"]).select("__new_id", "__old_id").distinct()

    ns = new_sigs.select(
        F.col(id_col).alias("__new_id"), "seed", F.col("minhash").alias("__mh_new")
    )
    cs = corpus_sigs.select(
        F.col(id_col).alias("__old_id"), "seed", F.col("minhash").alias("__mh_old")
    )
    qualifying = (
        cands.join(ns, "__new_id")
        .join(cs, ["__old_id", "seed"])
        .groupBy("__new_id", "__old_id")
        .agg(
            (
                F.sum(F.when(F.col("__mh_new") == F.col("__mh_old"), 1).otherwise(0))
                / F.lit(float(num_hashes))
            ).alias("est_jaccard")
        )
        .filter(F.col("est_jaccard") >= threshold)
    )
    # per-new-doc argmax (est_jaccard desc, old_id asc) as a min-struct
    # AGGREGATE, not a window: MIN gets map-side partial aggregation, so a
    # new doc that matches a 1e8-copy stored cluster collapses inside each
    # scan partition before the exchange instead of shipping every
    # qualifying pair to one reducer (same de-skew as span_dedup's
    # keep-first, operators/lexical.py::_first_occurrence). Negating the
    # double flips desc->asc exactly (IEEE negation is lossless).
    best = (
        qualifying.groupBy("__new_id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("est_jaccard")).alias("_nj"),
                    F.col("__old_id").alias("_o"),
                )
            ).alias("_b")
        )
        .select(
            "__new_id",
            F.col("_b._o").alias("__old_id"),
            (-F.col("_b._nj")).alias("est_jaccard"),
        )
    )
    ids = new_docs.select(F.col(id_col).alias("__new_id"))
    return ids.join(best, "__new_id", "left").select(
        F.col("__new_id").alias(id_col),
        F.col("est_jaccard").isNotNull().alias("is_dup"),
        F.col("__old_id").alias("matched_id"),
        F.col("est_jaccard"),
    )


def write_neardup_index(
    docs: DataFrame,
    table_prefix: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    hash_family: str = "fast",
    n_buckets: int = 32,
) -> dict:
    """Build and PERSIST the incremental-dedup corpus index as bucketed
    warehouse tables — the storage shape the :func:`incremental_neardup`
    docstring promises at 100 TB (r5 VERDICT #7).

    Writes three tables under ``table_prefix``:

    * ``<prefix>_sigs`` — ``(id, seed, minhash)`` signature rows,
      ``bucketBy(n_buckets, id)`` + sorted by id: the agreement join keys
      on ``(id, seed)``, and hash-partitioning by id alone satisfies the
      clustered distribution over ``(id, seed)`` — co-located without any
      corpus shuffle when the batch side is distributed the same way (the
      serving plan broadcasts the batch side anyway, so the scan is only
      ever probed);
    * ``<prefix>_bands`` — ``(id, band, band_sig)`` band digests,
      ``bucketBy(n_buckets, band_sig)``: the candidate equi-join keys on
      ``(band, band_sig)``;
    * ``<prefix>_meta`` — ONE row carrying the signature parameters
      (``hash_family``, ``num_hashes``, ``rows_per_band``, ``shingle_n``)
      so serving can validate family compatibility EXPLICITLY instead of
      sniffing dtypes (r5 ADVICE: md5-vs-other families are schema-
      indistinguishable; :func:`read_neardup_index` returns this dict and
      :func:`incremental_neardup` takes it as ``corpus_hash_family``).

    The fast family computes minima AND band digests in ONE pass of the
    fused kernel; md5 runs the oracle-replayable kernels.  Returns the
    metadata dict.  Appending a accepted batch later = appending its
    signature/band rows to the same tables (bucket spec is preserved by
    ``insertInto``).
    """
    spark = docs.sparkSession
    if hash_family == "fast":
        nbm = minhash_band_signatures_vectorized(
            docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            shingle_n=shingle_n, rows_per_band=rows_per_band, with_minima=True,
        ).localCheckpoint()  # one kernel pass serves both tables
        bands = nbm.select(id_col, "band", "band_sig")
        sigs = nbm.select(
            F.col(id_col), F.col("band"), F.posexplode("minima")
        ).select(
            F.col(id_col),
            (F.col("band") * rows_per_band + F.col("pos")).cast("long").alias("seed"),
            F.col("col").alias("minhash"),
        )
    else:
        sigs = minhash_signatures_fast(
            docs, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
            shingle_n=shingle_n, hash_family=hash_family,
        ).localCheckpoint()
        bands = band_signatures(sigs, id_col, rows_per_band)
    (
        sigs.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, id_col).sortBy(id_col)
        .saveAsTable(f"{table_prefix}_sigs")
    )
    (
        bands.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "band_sig").sortBy("band_sig")
        .saveAsTable(f"{table_prefix}_bands")
    )
    meta = {
        "hash_family": hash_family, "num_hashes": num_hashes,
        "rows_per_band": rows_per_band, "shingle_n": shingle_n,
        "id_col": id_col, "n_buckets": n_buckets,
    }
    spark.createDataFrame(
        [(hash_family, num_hashes, rows_per_band, shingle_n, id_col, n_buckets)],
        "hash_family string, num_hashes int, rows_per_band int, "
        "shingle_n int, id_col string, n_buckets int",
    ).write.mode("overwrite").format("parquet").saveAsTable(f"{table_prefix}_meta")
    return meta


def append_neardup_index(
    accepted_docs: DataFrame,
    table_prefix: str,
    text_col: str = "text",
) -> None:
    """Append an ACCEPTED batch's signatures + band digests to a stored
    index (the daily-crawl loop: dedup the batch with
    :func:`incremental_neardup`, keep the novel rows, then index them so
    tomorrow's batch dedups against them too).  Signature parameters come
    from the index's own metadata table — a batch can never be signed with
    the wrong family/params.  ``insertInto`` preserves the tables' bucket
    spec, so appended rows land in the correct buckets."""
    spark = accepted_docs.sparkSession
    meta = spark.read.table(f"{table_prefix}_meta").first().asDict()
    id_col = meta["id_col"]
    if meta["hash_family"] == "fast":
        nbm = minhash_band_signatures_vectorized(
            accepted_docs, id_col=id_col, text_col=text_col,
            num_hashes=meta["num_hashes"], shingle_n=meta["shingle_n"],
            rows_per_band=meta["rows_per_band"], with_minima=True,
        ).localCheckpoint()
        bands = nbm.select(id_col, "band", "band_sig")
        sigs = nbm.select(
            F.col(id_col), F.col("band"), F.posexplode("minima")
        ).select(
            F.col(id_col),
            (F.col("band") * meta["rows_per_band"] + F.col("pos"))
            .cast("long").alias("seed"),
            F.col("col").alias("minhash"),
        )
    else:
        sigs = minhash_signatures_fast(
            accepted_docs, id_col=id_col, text_col=text_col,
            num_hashes=meta["num_hashes"], shingle_n=meta["shingle_n"],
            hash_family=meta["hash_family"],
        ).localCheckpoint()
        bands = band_signatures(sigs, id_col, meta["rows_per_band"])
    # re-index closes the tombstone (r9 ADVICE): a deleted id that a later
    # crawl legitimately re-indexes must become servable again — a stale
    # tombstone row would keep masking it, and compaction would then fold
    # the fresh signatures out of storage.  Cleared BEFORE the appends: a
    # crash in between replays as a plain re-append, never a masked id.
    _clear_id_tombstones(
        spark, table_prefix, accepted_docs.select(id_col).distinct(), id_col
    )
    sigs.write.mode("append").insertInto(f"{table_prefix}_sigs")
    bands.write.mode("append").insertInto(f"{table_prefix}_bands")


def read_neardup_index(
    spark, table_prefix: str
) -> tuple[DataFrame, DataFrame, dict]:
    """Load a stored corpus index written by :func:`write_neardup_index`:
    ``(corpus_sigs, corpus_bands, meta)``.  Pass the relations plus
    ``corpus_hash_family=meta["hash_family"]`` (and the stored signature
    params) straight into :func:`incremental_neardup` — the explicit
    family declaration makes a cross-family serving call fail loudly.

    Always refreshes the tables first: Spark caches a table's file
    listing PER SESSION, and :func:`append_neardup_index` may have run in
    a different session (e.g. the cloned micro-batch session inside
    ``foreachBatch`` — found live: without the refresh, a serving session
    that had read the index before an append kept the stale listing and
    silently missed every appended signature).  A file listing on the
    index tables is cheap next to any batch it serves."""
    for t in ("_sigs", "_bands", "_meta"):
        spark.catalog.refreshTable(f"{table_prefix}{t}")
    if spark.catalog.tableExists(f"{table_prefix}_tombstones"):
        spark.catalog.refreshTable(f"{table_prefix}_tombstones")
    meta_row = spark.read.table(f"{table_prefix}_meta").first()
    meta = meta_row.asDict()
    # tombstoned ids (r9b: tombstone_neardup_index) are masked here via a
    # broadcast anti-join, so every serving path forgets deleted docs
    # immediately; compact_neardup_index folds the mask into storage
    return (
        _mask_tombstones(
            spark, table_prefix,
            spark.read.table(f"{table_prefix}_sigs"), meta["id_col"],
        ),
        _mask_tombstones(
            spark, table_prefix,
            spark.read.table(f"{table_prefix}_bands"), meta["id_col"],
        ),
        meta,
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
    # Exact integer threshold + unrounded quotient, as in
    # :func:`verify_candidate_edges` (r10 VERDICT #2 — the cross-engine
    # ROUND boundary class). Strict form: `round4(i/u) > t` ⟺
    # `20000·i >= (2·t·10⁴ + 1)·u`.
    thr4 = int(round(threshold * 10000))
    n_union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    keep = (F.lit(20000).cast("long") * F.col("n_inter")) >= (
        F.lit(2 * thr4 + 1).cast("long") * n_union
    )
    return (
        inter.join(F.broadcast(ca), "id_a")
        .join(F.broadcast(cb), "id_b")
        .filter(keep)
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter").cast("double") / n_union).alias("jaccard"),
        )
    )


def tombstone_neardup_index(
    spark,
    table_prefix: str,
    ids,
) -> int:
    """Mark documents DELETED in a stored neardup index (the crawl
    warehouse's right-to-be-forgotten path): appends their ids to a
    ``<prefix>_tombstones`` table — an O(delete-batch) write, no touch of
    the corpus-sized signature/band tables.  :func:`read_neardup_index`
    masks tombstoned rows at serve time via a broadcast anti-join (the
    tombstone set is deletes-sized, so no stored-side shuffle and the
    bucketed join paths are preserved); :func:`compact_neardup_index`
    later folds the mask into the storage.

    ``ids`` is a list of id values or a single-column DataFrame named
    after the index's id column.  Returns the number of ids tombstoned.
    """
    meta = spark.read.table(f"{table_prefix}_meta").first().asDict()
    id_col = meta["id_col"]
    if isinstance(ids, DataFrame):
        tomb = ids.select(F.col(ids.columns[0]).alias(id_col)).distinct()
    else:
        id_t = dict(spark.read.table(f"{table_prefix}_sigs").dtypes)[id_col]
        tomb = spark.createDataFrame(
            [(v,) for v in ids], f"`{id_col}` {id_t}"
        ).distinct()
    n = tomb.count()
    tname = f"{table_prefix}_tombstones"
    if not spark.catalog.tableExists(tname):
        tomb.limit(0).write.mode("overwrite").format("parquet").saveAsTable(tname)
    tomb.write.mode("append").format("parquet").insertInto(tname)
    return n


def _mask_tombstones(spark, table_prefix: str, df: DataFrame, id_col: str) -> DataFrame:
    tname = f"{table_prefix}_tombstones"
    if not spark.catalog.tableExists(tname):
        return df
    tomb = spark.read.table(tname)
    # deletes-sized set: broadcast anti-join leaves the stored side's
    # bucketed distribution untouched (no Exchange on the corpus tables)
    return df.join(F.broadcast(tomb), id_col, "left_anti")


def _clear_id_tombstones(spark, table_prefix: str, ids: DataFrame, id_col: str) -> None:
    """Drop the given ids from ``<prefix>_tombstones`` — called when a
    tombstoned id is RE-INDEXED (r9 ADVICE): without this, the stale
    tombstone keeps masking the re-indexed rows at serve time, and the
    next compaction folds them out of storage entirely.  Parquet tables
    have no row DELETE; the tombstone table is O(delete-batch) small by
    construction, so an anti-join rewrite is cheap.

    Crash safety (r10 ADVICE): rewrite to ``_staging`` + rename-aside
    swap — an in-place ``mode('overwrite')`` dying mid-write would drop
    ALL pending tombstones, not just the re-indexed ones — and skip the
    rewrite entirely when the batch intersects zero tombstones (no
    churn on the common no-op path)."""
    tname = f"{table_prefix}_tombstones"
    if not spark.catalog.tableExists(tname):
        return
    spark.catalog.refreshTable(tname)
    tomb = spark.read.table(tname)
    keys = F.broadcast(ids.select(id_col))
    if tomb.join(keys, id_col, "left_semi").limit(1).count() == 0:
        return  # nothing to clear — leave the table untouched
    remaining = tomb.join(keys, id_col, "left_anti")
    remaining.write.mode("overwrite").format("parquet").saveAsTable(
        f"{tname}_staging"
    )
    swap_staging_table(spark, tname)


def swap_staging_table(spark, table: str) -> None:
    """Swap ``<table>_staging`` into place via RENAME-ASIDE (r9 ADVICE):
    live → ``_old``, staging → live, drop ``_old``.  The old
    DROP-then-RENAME order destroyed the live table first — a crash
    between the two statements left no table at all, breaking every
    serving call until manual repair.  With rename-aside the data always
    exists; a crash mid-swap is recovered by renaming ``_old`` (or
    ``_staging``) back, never by rebuilding state."""
    old = f"{table}_old"
    if spark.catalog.tableExists(old):  # leftover from a prior crash
        spark.sql(f"DROP TABLE {old}")
    spark.sql(f"ALTER TABLE {table} RENAME TO {old}")
    spark.sql(f"ALTER TABLE {table}_staging RENAME TO {table}")
    spark.sql(f"DROP TABLE {old}")


def compact_neardup_index(spark, table_prefix: str) -> dict:
    """Fold accumulated tombstones into the physical index: rewrite the
    signature and band tables WITHOUT the tombstoned ids (same bucketBy
    spec — ``saveAsTable`` on staging names, then a rename-aside swap per
    table, :func:`swap_staging_table`), and truncate the tombstone table.
    The crawl-loop maintenance step after enough deletes/re-crawls
    accumulate: serving cost returns to pure bucketed probes with no mask
    join.

    Returns ``{"sigs_rows": n, "bands_rows": n, "tombstones_folded": n}``.
    """
    meta = spark.read.table(f"{table_prefix}_meta").first().asDict()
    id_col, n_buckets = meta["id_col"], int(meta["n_buckets"])
    tname = f"{table_prefix}_tombstones"
    n_tomb = (
        spark.read.table(tname).count()
        if spark.catalog.tableExists(tname)
        else 0
    )
    sigs = _mask_tombstones(
        spark, table_prefix, spark.read.table(f"{table_prefix}_sigs"), id_col
    )
    bands = _mask_tombstones(
        spark, table_prefix, spark.read.table(f"{table_prefix}_bands"), id_col
    )
    (
        sigs.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, id_col).sortBy(id_col)
        .saveAsTable(f"{table_prefix}_sigs_staging")
    )
    (
        bands.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "band_sig").sortBy("band_sig")
        .saveAsTable(f"{table_prefix}_bands_staging")
    )
    for t in ("sigs", "bands"):
        swap_staging_table(spark, f"{table_prefix}_{t}")
    if n_tomb:
        spark.sql(f"TRUNCATE TABLE {tname}")
    return {
        "sigs_rows": spark.read.table(f"{table_prefix}_sigs").count(),
        "bands_rows": spark.read.table(f"{table_prefix}_bands").count(),
        "tombstones_folded": int(n_tomb),
    }


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-snapshot delta — what changed between two crawls of the same
    key space (canonical URL or doc id): one row per key present in
    either snapshot with ``status`` ``added`` / ``removed`` / ``changed``
    / ``unchanged`` and both content hashes (NULL on the missing side).
    The monthly-dump loop runs this FIRST: only ``added``+``changed``
    rows flow into the funnel/dedup/index stages, turning a full recrawl
    into an incremental batch (CommonCrawl month-over-month overlap is
    large, so the delta is a small fraction of the dump).

    Change detection is normalize-then-hash (``normalize_text`` + md5 —
    the funnel/exact-dedup content identity), so cosmetic case/
    punctuation/whitespace churn does not count as change.

    Scale shape: each side collapses to ``(key, hash)`` (narrow), then
    ONE full outer equi-join on the key — hash-partitioned, no skew
    (keys are unique per side by construction; duplicate keys within a
    side are first collapsed by min-hash keep-one, a map-side-partial
    aggregate).
    """
    from ..functions.text import normalize_text

    def side(df, alias):
        return (
            df.select(
                F.col(key_col),
                F.md5(normalize_text(F.col(text_col))).alias("_h"),
            )
            .groupBy(key_col)
            .agg(F.min("_h").alias(alias))
        )

    o = side(old, "old_hash")
    n = side(new, "new_hash")
    joined = o.join(n, key_col, "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") == F.col("new_hash"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(key_col, "old_hash", "new_hash", status.alias("status"))
