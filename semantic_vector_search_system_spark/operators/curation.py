"""The end-to-end curation funnel as a SERVABLE, incremental pipeline.

The batch catalog row ``curation_funnel`` (r8) pins the COMPOSITION of
four oracle-verified operators over one static corpus: length gate ->
classifier margin -> bigram-LM fluency at the population median ->
normalize-then-hash dedup keep-one.  A production crawl loop runs the
same funnel INCREMENTALLY (r8 VERDICT #4): the LM model and its
threshold are FIT ONCE on a reference snapshot and stored; every
micro-batch then flows through the stored gates, and the dedup stage
keeps state (the set of accepted content hashes) so later batches drop
copies of anything accepted earlier — exactly the incremental trilogy
shape (incremental_neardup / incremental_span_dedup /
incremental_semdedup), applied to the whole funnel at once.

Batch-equivalence contract (tested, and pinned by the catalog row
``stream_curation_funnel``): processing a corpus in ascending-id batches
through :func:`incremental_curation_funnel` with state fit on that same
corpus accepts EXACTLY the batch funnel's stage-4 survivors — gates 1-3
are row-local given the stored model/threshold, and ascending-id batch
order + in-batch min-id keep-first reproduces the global min-id
keep-one.

Scale: the stored model is vocabulary-bounded (cnt2/cnt1 relations +
one threshold row); each batch runs one explode + broadcast joins + one
hash-keyed min-struct aggregate; the hash state table is one row per
DISTINCT accepted hash, bucketed for a shuffle-free probe of the stored
side.  No stage touches the reference corpus again after the fit.

Reference: the reference pipeline (`auto_run_tests.py`) has no curation
stage at all — this family is part of the training-data extension
surface (SURVEY beyond-§2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import normalize_text, tokenize


def _funnel_stages(
    batch: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame],
    threshold: float,
    min_tokens: int,
    doc_id: str,
    text_col: str,
    lm_strategy: str = "auto",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Stages 1-3 over one batch with the STORED model/threshold:
    returns (s1, s2, s3) survivor relations, each carrying
    (doc_id, text)."""
    from .lm import bigram_lm_score
    from .quality_filters import quality_accept_col

    s1 = batch.filter(F.size(tokenize(F.col(text_col))) >= min_tokens)
    # the classifier accept is ROW-LOCAL (weights=None margin is a narrow
    # DECIMAL fold), so gate 2 is a plain filter — the r8 form joined the
    # margin relation back on doc_id, shuffling every batch's text for a
    # per-row decision (same accepted set, one exchange fewer per batch)
    s2 = s1.filter(quality_accept_col(text_col))
    # lm_strategy="auto" (r9b/r14): while the stored model fits a heap
    # (serving hot path), the LM gate is a ROW-LOCAL scalar-UDF filter —
    # bitwise the fast relation face's score (lm.bigram_lm_score_col),
    # with no doc-keyed join and no second computation of s2 on the
    # join's probe side (the r13 shape computed s2 once per join branch);
    # expr joins beyond the bound (open-vocabulary models).  <2-token
    # texts score NULL and fail the >= comparison, exactly the relation
    # face's inner-join drop.
    if lm_strategy == "auto":
        from .lm import DEFAULT_MAX_MODEL_ROWS, bigram_lm_score_col

        # the SHARED constant (r14 ADVICE): the funnel's auto gate must
        # pick the same face bigram_lm_score(strategy='auto') picks in
        # fit_funnel_state, or fit/serve batch-equivalence breaks
        bound = DEFAULT_MAX_MODEL_ROWS
        probe = model[0].limit(bound + 1).count()
        if probe <= bound:
            score = bigram_lm_score_col(
                batch.sparkSession, model, text_col=text_col,
                max_model_rows=bound,
            )
            s3 = s2.filter(score >= F.lit(float(threshold)))
            return s1, s2, s3
        lm_strategy = "expr"
    rep = bigram_lm_score(
        s2, model, text_col=text_col, doc_id=doc_id, strategy=lm_strategy
    )
    s3 = s2.join(
        rep.filter(F.col("lm_score") >= F.lit(float(threshold))).select(doc_id),
        doc_id,
    )
    return s1, s2, s3


def fit_funnel_state(
    docs: DataFrame,
    min_tokens: int = 20,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Fit the funnel's stored gate state on a reference corpus:
    ``{"model": (cnt2, cnt1, vocab), "threshold": float, "min_tokens"}``.

    The threshold is the EXACT median lm_score of the corpus' stage-2
    survivors — the same ``percentile(lm_score, 0.5)`` the batch
    catalog row computes, so serving the fit corpus through the stored
    gates reproduces the batch funnel bit-for-bit.  The median is a
    single-row aggregate collect (bounded)."""
    from .lm import bigram_lm_score, train_bigram_lm
    from .quality_filters import quality_accept_col

    cnt2, cnt1, vocab = train_bigram_lm(docs, text_col=text_col)
    # the count relations are probed once per micro-batch for the life of
    # the fitted state: pin them so the corpus-sized bigram explode runs
    # exactly once (on a cluster, persist to reliable storage instead —
    # that is what write_funnel_state does).  cnt1 is RE-DERIVED from the
    # checkpointed cnt2 (one vocabulary-bounded aggregate) and vocab is
    # collapsed to a literal relation — the r9a form checkpointed cnt1
    # off the PRE-checkpoint lineage and kept vocab lazy, re-running the
    # corpus-sized bigram explode once more per reference (2 extra corpus
    # passes measured in the 1M fit).
    c2 = cnt2.localCheckpoint()
    c1 = c2.groupBy("w1").agg(F.sum("c12").alias("c1")).localCheckpoint()
    vs = int(vocab.collect()[0]["vs"])
    vocab_lit = docs.sparkSession.createDataFrame([(vs,)], "vs long")
    model = (c2, c1, vocab_lit)
    s1 = docs.filter(F.size(tokenize(F.col(text_col))) >= min_tokens)
    s2 = s1.filter(quality_accept_col(text_col))  # row-local, no join
    rep = bigram_lm_score(
        s2, model, text_col=text_col, doc_id=doc_id, strategy="auto"
    )
    thr_row = rep.agg(F.expr("percentile(lm_score, 0.5)").alias("m50")).collect()[0]
    thr = thr_row["m50"]
    if thr is None:
        raise ValueError(
            "fit_funnel_state: no documents survived the length+classifier "
            "gates — cannot fit an LM threshold on an empty population"
        )
    return {
        "model": model,
        "threshold": float(thr),
        "min_tokens": int(min_tokens),
    }


def incremental_curation_funnel(
    batch: DataFrame,
    state: dict,
    seen_hashes: DataFrame | None = None,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch through the stored-state funnel.

    Returns ``(accepted, novel_hashes)``:

    * ``accepted`` — ``(doc_id, norm_hash)``: stage-3 survivors that are
      the FIRST occurrence of their normalized content hash, both
      within the batch (min-id per hash via a min-struct AGGREGATE —
      the de-skew keep-first shape, map-side partials collapse
      boilerplate copies before the exchange) and against
      ``seen_hashes`` (an anti-join probe of prior state);
    * ``novel_hashes`` — ``(norm_hash)``: the hashes this batch adds to
      the state.  The caller appends them (``unionByName`` for the
      in-memory face, table append for the stored face) so every later
      batch dedups against everything accepted before it.
    """
    s1, s2, s3 = _funnel_stages(
        batch, state["model"], state["threshold"], state["min_tokens"],
        doc_id, text_col,
    )
    hashed = s3.select(
        F.md5(normalize_text(F.col(text_col))).alias("norm_hash"),
        F.col(doc_id),
    )
    first = (
        hashed.groupBy("norm_hash")
        .agg(F.min(F.struct(doc_id)).alias("_m"))
        .select("norm_hash", F.col(f"_m.{doc_id}").alias(doc_id))
    )
    if seen_hashes is not None:
        # r14 (guide §3.1; plan-audited): Spark was BROADCASTING the
        # stored accepted-hash state (corpus-sized, ~1M rows at the bench
        # shape, growing with every batch) to anti-join the churn-sized
        # probe — a per-call driver collect of state that the
        # bucketBy(norm_hash) layout exists to keep in place.  The
        # shuffle-hash hint pins the scale-correct shape: the stored side
        # is read where it lives, only the batch-sized probe shuffles.
        # A join hint never changes semantics.
        first = first.join(
            seen_hashes.hint("shuffle_hash"), "norm_hash", "left_anti"
        )
    accepted = first.select(doc_id, "norm_hash")
    return accepted, accepted.select("norm_hash")


# --- stored-state (warehouse) face -----------------------------------------

def write_funnel_state(
    docs: DataFrame,
    table_prefix: str,
    min_tokens: int = 20,
    doc_id: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 8,
) -> dict:
    """Fit and PERSIST the funnel gate state as warehouse tables — the
    funnel analog of ``write_dsir_model``/``write_neardup_index``:

    * ``<prefix>_cnt2`` / ``<prefix>_cnt1`` / ``<prefix>_meta`` — the
      vocabulary-bounded bigram LM counts plus one meta row
      ``(vs, threshold, min_tokens)``;
    * ``<prefix>_hashes`` — the accepted-content-hash state, created
      EMPTY and bucketed by ``norm_hash`` so each batch's anti-join
      probes the stored side without shuffling it.
    """
    spark = docs.sparkSession
    state = fit_funnel_state(docs, min_tokens, doc_id, text_col)
    cnt2, cnt1, vocab = state["model"]
    cnt2.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_cnt2"
    )
    cnt1.write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_cnt1"
    )
    vs = vocab.collect()[0]["vs"]
    spark.createDataFrame(
        [(int(vs), float(state["threshold"]), int(min_tokens))],
        "vs long, threshold double, min_tokens int",
    ).write.mode("overwrite").format("parquet").saveAsTable(
        f"{table_prefix}_meta"
    )
    empty = spark.createDataFrame([], "norm_hash string")
    (
        empty.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, "norm_hash")
        .saveAsTable(f"{table_prefix}_hashes")
    )
    return {"threshold": state["threshold"], "min_tokens": min_tokens, "vs": int(vs)}


def read_funnel_state(spark: SparkSession, table_prefix: str) -> dict:
    """Load the stored gate state written by :func:`write_funnel_state`."""
    meta = spark.read.table(f"{table_prefix}_meta").collect()[0]
    model = (
        spark.read.table(f"{table_prefix}_cnt2"),
        spark.read.table(f"{table_prefix}_cnt1"),
        spark.createDataFrame([(int(meta["vs"]),)], "vs long"),
    )
    return {
        "model": model,
        "threshold": float(meta["threshold"]),
        "min_tokens": int(meta["min_tokens"]),
    }


def incremental_curation_funnel_stored(
    batch: DataFrame,
    table_prefix: str,
    update_index: bool = True,
    doc_id: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The crawl-loop serving face: one batch through the STORED gate
    state, deduped against the STORED hash table; with ``update_index``
    the batch's novel hashes append to the state (bucket-preserving
    insert), so the next call — today's next micro-batch or next
    month's crawl — sees them.  Returns the accepted rows
    ``(doc_id, norm_hash)`` MATERIALIZED (the append must not observe
    its own output)."""
    spark = batch.sparkSession
    state = read_funnel_state(spark, table_prefix)
    # forgotten hashes (forget_funnel_hashes) are masked so a recrawl of
    # deleted content is accepted again; compact_funnel_hashes folds the
    # mask into storage
    seen = _mask_hash_tombstones(
        spark, table_prefix, spark.read.table(f"{table_prefix}_hashes")
    )
    accepted, novel = incremental_curation_funnel(
        batch, state, seen_hashes=seen, doc_id=doc_id, text_col=text_col
    )
    accepted = accepted.localCheckpoint()
    if update_index:
        append_funnel_hashes(spark, table_prefix, accepted)
    return accepted


def append_funnel_hashes(
    spark: SparkSession, table_prefix: str, accepted: DataFrame
) -> None:
    """Commit a batch's accepted hashes to the stored state.  Two rules
    (both r9 ADVICE):

    * re-accept closes the tombstone: a forgotten hash that a recrawl
      just re-accepted must be protected IMMEDIATELY — leaving its
      tombstone row in place would keep masking it out of ``seen``, so
      every later batch carrying the same content would be accepted
      again (and compact would then anti-join the re-accepted hash out
      of storage: the dedup invariant permanently broken).  Cleared
      BEFORE the hash append: a crash between the two leaves the hash
      absent from storage with no tombstone — the batch replays as a
      plain re-accept (at-least-once), never a permanently masked hash.
    * callers that ALSO write the accepted rows somewhere (the streaming
      face's ``out_path``) must write those rows FIRST and call this
      LAST — appending the hashes before the output commit would make a
      replayed batch anti-join its own rows away, silently losing them
      (at-most-once).
    """
    _clear_hash_tombstones(spark, table_prefix, accepted.select("norm_hash"))
    accepted.select("norm_hash").write.mode("append").insertInto(
        f"{table_prefix}_hashes"
    )


# --- right-to-be-forgotten for the hash state (r9b) -------------------------

def forget_funnel_hashes(
    spark: SparkSession,
    table_prefix: str,
    docs: DataFrame | None = None,
    hashes: DataFrame | None = None,
    text_col: str = "text",
) -> int:
    """Remove content from the funnel's accepted-hash state — the funnel
    half of the warehouse right-to-be-forgotten path (the dedup-index
    half is ``dedup.tombstone_neardup_index``): after forgetting, a
    future batch carrying the same normalized content is ACCEPTED again
    instead of anti-joined away.

    Content is named either by ``docs`` (rows whose ``text_col`` is
    normalize-then-hashed exactly like acceptance did) or by ``hashes``
    (a single-column relation of norm_hash values).  The tombstones land
    in ``<prefix>_hash_tombstones`` — an O(forget-batch) append; serving
    masks them with a broadcast anti-join (deletes-sized, the stored
    bucketed table never shuffles) until :func:`compact_funnel_hashes`
    folds them into storage.  Returns the number of hashes tombstoned.
    """
    if (docs is None) == (hashes is None):
        raise ValueError("forget_funnel_hashes: pass exactly one of docs|hashes")
    if docs is not None:
        tomb = docs.select(
            F.md5(normalize_text(F.col(text_col))).alias("norm_hash")
        ).distinct()
    else:
        tomb = hashes.select(
            F.col(hashes.columns[0]).alias("norm_hash")
        ).distinct()
    tname = f"{table_prefix}_hash_tombstones"
    if not spark.catalog.tableExists(tname):
        tomb.limit(0).write.mode("overwrite").format("parquet").saveAsTable(tname)
    n = tomb.count()
    tomb.write.mode("append").format("parquet").insertInto(tname)
    return n


def _mask_hash_tombstones(spark: SparkSession, table_prefix: str, seen: DataFrame) -> DataFrame:
    tname = f"{table_prefix}_hash_tombstones"
    if not spark.catalog.tableExists(tname):
        return seen
    spark.catalog.refreshTable(tname)
    return seen.join(
        F.broadcast(spark.read.table(tname)), "norm_hash", "left_anti"
    )


def _clear_hash_tombstones(
    spark: SparkSession, table_prefix: str, hashes: DataFrame
) -> None:
    """Drop the given hashes from ``<prefix>_hash_tombstones`` (parquet
    tables have no row DELETE, and the tombstone table is O(forget-batch)
    small by construction, so this is a cheap anti-join rewrite).

    Crash safety (r10 ADVICE): the rewrite goes to a ``_staging`` table
    and swaps in via :func:`dedup.swap_staging_table` — a non-atomic
    in-place ``mode('overwrite')`` could die mid-write and drop ALL
    pending tombstones, silently un-forgetting unrelated
    right-to-be-forgotten requests.  And when the batch intersects zero
    tombstones (the overwhelmingly common case — re-accepts of
    never-forgotten hashes), the table is left untouched instead of
    being churned on every batch."""
    from .dedup import swap_staging_table

    tname = f"{table_prefix}_hash_tombstones"
    if not spark.catalog.tableExists(tname):
        return
    spark.catalog.refreshTable(tname)
    tomb = spark.read.table(tname)
    keys = F.broadcast(hashes.select("norm_hash"))
    if tomb.join(keys, "norm_hash", "left_semi").limit(1).count() == 0:
        return  # nothing to clear — skip the rewrite entirely
    remaining = tomb.join(keys, "norm_hash", "left_anti")
    remaining.write.mode("overwrite").format("parquet").saveAsTable(
        f"{tname}_staging"
    )
    swap_staging_table(spark, tname)


def compact_funnel_hashes(spark: SparkSession, table_prefix: str, n_buckets: int = 8) -> dict:
    """Fold hash tombstones into storage: rewrite ``<prefix>_hashes``
    without the forgotten hashes (same bucketBy via a staging table +
    rename-aside swap — the ``compact_neardup_index`` recipe), dedup
    any re-accept duplicate rows, and truncate the tombstone table.
    Returns ``{"hashes_rows": n, "tombstones_folded": n}``.

    Swap order (r9 ADVICE): live → ``_old``, staging → live, drop
    ``_old``.  The old DROP-then-RENAME left NO hashes table at all if
    the process died between the two statements; with rename-aside the
    data always exists — a crash mid-swap is recovered by renaming
    ``_old`` (or ``_staging``) back, never by rebuilding state."""
    tname = f"{table_prefix}_hash_tombstones"
    n_tomb = (
        spark.read.table(tname).count()
        if spark.catalog.tableExists(tname)
        else 0
    )
    kept = _mask_hash_tombstones(
        spark, table_prefix, spark.read.table(f"{table_prefix}_hashes")
    ).distinct()  # re-accept appends may have duplicated a hash row
    (
        kept.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "norm_hash")
        .saveAsTable(f"{table_prefix}_hashes_staging")
    )
    from .dedup import swap_staging_table

    swap_staging_table(spark, f"{table_prefix}_hashes")
    if n_tomb:
        spark.sql(f"TRUNCATE TABLE {tname}")
    return {
        "hashes_rows": spark.read.table(f"{table_prefix}_hashes").count(),
        "tombstones_folded": int(n_tomb),
    }
