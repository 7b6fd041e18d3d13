"""Normalize-then-hash dedup (operators/dedup.py::normalized_exact_dedup)
and leakage-safe splits (operators/corpus.py::leakage_safe_splits)."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.functions.hashing import stable_hash64_py
from semantic_vector_search_system_spark.operators.corpus import leakage_safe_splits
from semantic_vector_search_system_spark.operators.dedup import (
    exact_dedup,
    normalized_exact_dedup,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_normalized_dedup_collapses_case_and_punct_variants(spark):
    docs = _docs(
        spark,
        [
            "Hello, World!",          # 0: three raw variants, one norm group
            "hello world",            # 1
            "HELLO   world.",         # 2
            "something else",         # 3: singleton
            "something else",         # 4: raw exact dup of 3
        ],
    )
    rows = {r["canonical_id"]: r for r in normalized_exact_dedup(docs).collect()}
    assert rows[0]["n_copies"] == 3 and rows[0]["n_raw_variants"] == 3
    assert rows[3]["n_copies"] == 2 and rows[3]["n_raw_variants"] == 1
    # raw exact dedup would NOT merge the case variants
    raw = {r["canonical_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert raw[0] == 1 and raw[1] == 1 and raw[2] == 1 and raw[3] == 2


def test_normalized_dedup_reduces_to_exact_on_normalized_corpus(spark):
    docs = _docs(spark, ["alpha beta", "alpha beta", "gamma", ""])
    a = sorted(
        (r["n_copies"], r["canonical_id"], r["n_raw_variants"])
        for r in normalized_exact_dedup(docs).collect()
    )
    b = sorted(
        (r["n_copies"], r["canonical_id"], 1) for r in exact_dedup(docs).collect()
    )
    assert a == b


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_leakage_safe_splits_keep_components_together(spark):
    docs = _docs(spark, [f"doc {i}" for i in range(10)])
    # chain 0~1~2 and pair 5~7: each component must share one split
    pairs = _pairs(spark, [(0, 1), (1, 2), (5, 7)])
    out = {r["doc_id"]: r for r in
           leakage_safe_splits(docs, pairs, {"train": 8, "val": 1, "test": 1},
                               seed=7).collect()}
    assert len(out) == 10
    assert {out[i]["group_key"] for i in (0, 1, 2)} == {0}
    assert {out[i]["group_key"] for i in (5, 7)} == {5}
    assert len({out[i]["split"] for i in (0, 1, 2)}) == 1
    assert out[5]["split"] == out[7]["split"]
    # singletons: own id is the group key, split = hash('7:id') % 10 rule
    for i in (3, 4, 6, 8, 9):
        assert out[i]["group_key"] == i
        b = stable_hash64_py(f"7:{i}") % 10
        want = "train" if b < 8 else ("val" if b < 9 else "test")
        assert out[i]["split"] == want


def test_leakage_safe_splits_incremental_stability(spark):
    """New members joining an existing cluster inherit its split: the
    split key is the component MIN id, which adding larger ids never
    changes."""
    docs1 = _docs(spark, [f"d{i}" for i in range(4)])
    out1 = {r["doc_id"]: r["split"] for r in
            leakage_safe_splits(docs1, _pairs(spark, [(0, 2)]),
                                {"train": 8, "val": 1, "test": 1}).collect()}
    docs2 = _docs(spark, [f"d{i}" for i in range(6)])
    out2 = {r["doc_id"]: r["split"] for r in
            leakage_safe_splits(docs2, _pairs(spark, [(0, 2), (2, 5)]),
                                {"train": 8, "val": 1, "test": 1}).collect()}
    for i in range(4):
        assert out2[i] == out1[i]
    assert out2[5] == out2[0]  # joined 0's cluster -> inherited its split


def test_normalize_text_edge_cases(spark):
    """normalize_text: idempotent, case/punct-insensitive, whitespace-
    collapsing; non-ASCII letters fall to the punctuation class (ASCII
    C4 shape, documented)."""
    from semantic_vector_search_system_spark.functions.text import normalize_text

    rows = [
        (0, "  Hello,   WORLD!!  "),
        (1, "hello world"),
        (2, "h\te\nl lo?"),
        (3, "Crème brûlée 42"),
        (4, ""),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {r["i"]: r["n"] for r in df.select("i", normalize_text("t").alias("n")).collect()}
    assert got[0] == "hello world" == got[1]
    assert got[2] == "h e l lo"
    assert got[3] == "cr me br l e 42"   # accented letters -> space
    assert got[4] == ""
    assert got[5] is None
    # idempotence: normalizing the normalized strings is a fixpoint
    df2 = spark.createDataFrame([(k, v) for k, v in got.items() if v is not None],
                                "i long, t string")
    again = {r["i"]: r["n"] for r in df2.select("i", normalize_text("t").alias("n")).collect()}
    assert again == {k: v for k, v in got.items() if v is not None}


# --- incremental / streaming curation funnel (r8 VERDICT #4) ---------------


def _salad(i: int, n: int = 25) -> str:
    """Deterministic >=20-token word salad, distinct per i."""
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta",
             "theta", "iota", "kappa", "lam", "mu"]
    return " ".join(words[(i * 7 + j * 3) % len(words)] + str((i + j) % 9)
                    for j in range(n))


def _corpus(spark, ids_texts):
    return spark.createDataFrame(ids_texts, "doc_id long, text string")


def test_incremental_funnel_batch_equivalence(spark):
    """The contract the catalog row stream_curation_funnel pins against
    DuckDB, in operator form with PLANTED cross-batch duplicates: state
    fit on the corpus + ascending-id batches through
    incremental_curation_funnel == the batch funnel's stage-4 survivors
    (normalize-then-hash keep-one over the gate survivors)."""
    from semantic_vector_search_system_spark.functions.text import (
        normalize_text,
        tokenize,
    )
    from semantic_vector_search_system_spark.operators.curation import (
        fit_funnel_state,
        incremental_curation_funnel,
    )
    from semantic_vector_search_system_spark.operators.lm import bigram_lm_score
    from semantic_vector_search_system_spark.operators.quality_filters import (
        linear_quality_margin,
    )

    rows = [(i, _salad(i)) for i in range(30)]
    # planted duplicates ACROSS the batch boundaries (batches are id
    # tertiles 0-9 / 10-19 / 20-29): same normalized content, different
    # case/punct; and an in-batch duplicate pair
    rows[15] = (15, rows[2][1].upper() + "!")     # dup of doc 2 across batches
    rows[25] = (25, rows[2][1] + ".")             # second copy, third batch
    rows[27] = (27, rows[26][1])                  # exact in-batch dup
    rows[5] = (5, "short text")                   # fails the length gate
    docs = _corpus(spark, rows)

    state = fit_funnel_state(docs)

    # batch-face survivors: gates with the SAME stored state, then
    # normalize-hash keep-one (min doc_id)
    s1 = docs.filter(F.size(tokenize(F.col("text"))) >= 20)
    m = linear_quality_margin(s1)
    s2 = s1.join(m.filter(F.col("accept")).select("doc_id"), "doc_id")
    rep = bigram_lm_score(s2, state["model"])
    s3 = s2.join(
        rep.filter(F.col("lm_score") >= state["threshold"]).select("doc_id"),
        "doc_id",
    )
    want = {
        (r["doc_id"], r["norm_hash"])
        for r in s3.select(
            F.md5(normalize_text(F.col("text"))).alias("norm_hash"), "doc_id"
        )
        .groupBy("norm_hash")
        .agg(F.min("doc_id").alias("doc_id"))
        .collect()
    }
    assert len(want) >= 5  # the corpus genuinely exercises every gate

    seen, got = None, set()
    for lo, hi in ((0, 10), (10, 20), (20, 30)):
        batch = docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        accepted, _ = incremental_curation_funnel(batch, state, seen_hashes=seen)
        accepted = accepted.localCheckpoint()
        got |= {(r["doc_id"], r["norm_hash"]) for r in accepted.collect()}
        nh = accepted.select("norm_hash")
        seen = nh if seen is None else seen.unionByName(nh)
    assert got == want
    # the planted cross-batch dups were actually exercised: doc 2's hash
    # accepted exactly once, and never from docs 15/25
    accepted_ids = {d for d, _ in got}
    assert 15 not in accepted_ids and 25 not in accepted_ids
    assert 27 not in accepted_ids or 26 not in accepted_ids


def test_streaming_curation_funnel_crawl_loop(spark, tmp_path):
    """foreachBatch + warehouse-state e2e: the stored face processes two
    micro-batches and must equal the in-memory incremental face over the
    same ordered batches; a batch-2 copy of a batch-1 accept is
    rejected; the hash state table grows by exactly the accepts."""
    from semantic_vector_search_system_spark.operators.curation import (
        fit_funnel_state,
        incremental_curation_funnel,
        write_funnel_state,
    )
    from semantic_vector_search_system_spark.streaming.events import (
        streaming_curation_funnel_foreach_batch,
    )

    prefix = "stream_cur_state"
    for t in ("_cnt2", "_cnt1", "_meta", "_hashes"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
    try:
        fit = _corpus(spark, [(i, _salad(i)) for i in range(30)])
        meta = write_funnel_state(fit, prefix)
        assert meta["vs"] > 0

        b1 = _corpus(spark, [(100 + i, _salad(i)) for i in range(10)])
        b2 = _corpus(
            spark,
            # 200-209 duplicate ALL of batch 1's contents: every one must
            # be rejected — either its twin was accepted (hash now in
            # state) or the content itself fails a gate (gates are
            # content-pure, so the copy fails identically)
            [(200 + i, _salad(i)) for i in range(10)]
            + [(210, _salad(40)), (211, _salad(41)),  # novel
               (212, "too short")],                    # length-gated
        )
        in_dir = str(tmp_path / "incoming_docs")
        b1.coalesce(1).write.mode("append").parquet(in_dir)
        b2.coalesce(1).write.mode("append").parquet(in_dir)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(in_dir)
        )
        out_path = str(tmp_path / "accepted_docs")
        streaming_curation_funnel_foreach_batch(spark, stream, prefix, out_path)

        got = {
            (r["doc_id"], r["norm_hash"])
            for r in spark.read.parquet(out_path).collect()
        }

        # reference: the in-memory incremental face over the same batches
        state = fit_funnel_state(fit)
        a1, _ = incremental_curation_funnel(b1, state)
        a1 = a1.localCheckpoint()
        a2, _ = incremental_curation_funnel(
            b2, state, seen_hashes=a1.select("norm_hash")
        )
        want = {
            (r["doc_id"], r["norm_hash"]) for r in a1.collect()
        } | {(r["doc_id"], r["norm_hash"]) for r in a2.collect()}
        assert got == want
        accepted_ids = {d for d, _ in got}
        assert accepted_ids, "corpus too strict — nothing accepted"
        # every batch-2 duplicate of batch-1 content is rejected
        assert not (accepted_ids & set(range(200, 210)))
        assert 212 not in accepted_ids
        # state grew by exactly the accepted hashes
        assert spark.read.table(f"{prefix}_hashes").count() == len(got)
    finally:
        for t in ("_cnt2", "_cnt1", "_meta", "_hashes"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")


def test_forget_funnel_hashes_and_compact(spark):
    """Right-to-be-forgotten in the funnel hash state (r9b): after
    forgetting a document's content, a recrawl of it is ACCEPTED again
    (the anti-join no longer masks it); compaction folds the tombstones
    into storage (bucketBy preserved — the append path keeps working)
    and truncates the tombstone table."""
    from semantic_vector_search_system_spark.operators.curation import (
        compact_funnel_hashes,
        forget_funnel_hashes,
        incremental_curation_funnel_stored,
        write_funnel_state,
    )

    prefix = "t_forget_cur_state"
    for t in ("_cnt2", "_cnt1", "_meta", "_hashes",
              "_hash_tombstones", "_hashes_staging"):
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
    try:
        fit = _corpus(spark, [(i, _salad(i)) for i in range(30)])
        write_funnel_state(fit, prefix)

        b1 = _corpus(spark, [(100 + i, _salad(i)) for i in range(8)])
        a1 = {r["doc_id"] for r in incremental_curation_funnel_stored(
            b1, prefix).collect()}
        assert a1, "corpus too strict — nothing accepted"
        target = min(a1)  # forget this accepted doc's content

        # a recrawl of the accepted content is rejected (hash in state)
        recrawl = _corpus(
            spark, [(500, _salad(target - 100))]  # same content, new id
        )
        assert not incremental_curation_funnel_stored(
            recrawl, prefix, update_index=False).collect()

        # forget it -> the same recrawl is accepted again
        n = forget_funnel_hashes(
            spark, prefix, docs=b1.filter(F.col("doc_id") == target)
        )
        assert n == 1
        got = {r["doc_id"] for r in incremental_curation_funnel_stored(
            recrawl, prefix, update_index=False).collect()}
        assert got == {500}, "forgotten content still masked"

        # compact: mask folded into storage, behavior unchanged
        n_hashes = spark.read.table(f"{prefix}_hashes").count()
        stats = compact_funnel_hashes(spark, prefix)
        assert stats["tombstones_folded"] == 1
        assert stats["hashes_rows"] == n_hashes - 1
        assert spark.read.table(f"{prefix}_hash_tombstones").count() == 0
        got2 = {r["doc_id"] for r in incremental_curation_funnel_stored(
            recrawl, prefix, update_index=False).collect()}
        assert got2 == {500}
        # the bucketed append path survives the staging swap
        accepted = incremental_curation_funnel_stored(recrawl, prefix)
        assert {r["doc_id"] for r in accepted.collect()} == {500}
        assert not incremental_curation_funnel_stored(
            recrawl, prefix, update_index=False).collect()
    finally:
        for t in ("_cnt2", "_cnt1", "_meta", "_hashes",
                  "_hash_tombstones", "_hashes_staging"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")


def test_reaccepted_hash_protected_before_compaction(spark):
    """The r9 ADVICE window: forget -> recrawl RE-ACCEPTED (update_index)
    -> the tombstone must be cleared at that moment, NOT at compaction.
    Before the fix the stale tombstone kept masking the re-appended hash,
    so every later batch carrying the same content was accepted again,
    and compaction then anti-joined the re-accepted hash out of storage —
    the dedup invariant permanently broken for re-accepted content."""
    from semantic_vector_search_system_spark.operators.curation import (
        compact_funnel_hashes,
        forget_funnel_hashes,
        incremental_curation_funnel_stored,
        write_funnel_state,
    )

    prefix = "t_reacc_cur_state"
    tables = ("_cnt2", "_cnt1", "_meta", "_hashes",
              "_hash_tombstones", "_hashes_staging", "_hashes_old")
    for t in tables:
        spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
    try:
        fit = _corpus(spark, [(i, _salad(i)) for i in range(30)])
        write_funnel_state(fit, prefix)

        b1 = _corpus(spark, [(100 + i, _salad(i)) for i in range(8)])
        a1 = {r["doc_id"] for r in incremental_curation_funnel_stored(
            b1, prefix).collect()}
        assert a1, "corpus too strict — nothing accepted"
        target = min(a1)

        # forget, then RE-ACCEPT via a recrawl WITH update_index=True
        assert forget_funnel_hashes(
            spark, prefix, docs=b1.filter(F.col("doc_id") == target)) == 1
        got = {r["doc_id"] for r in incremental_curation_funnel_stored(
            _corpus(spark, [(500, _salad(target - 100))]), prefix).collect()}
        assert got == {500}

        # the re-accept must have closed the tombstone...
        assert spark.read.table(f"{prefix}_hash_tombstones").count() == 0
        # ...so ANOTHER copy of the same content is rejected (pre-fix it
        # was accepted again: the tombstone still masked the hash)
        again = _corpus(spark, [(501, _salad(target - 100))])
        assert not incremental_curation_funnel_stored(
            again, prefix, update_index=False).collect()

        # and compaction keeps the re-accepted hash in storage (pre-fix
        # the stale tombstone folded it out), still rejecting the copy
        compact_funnel_hashes(spark, prefix)
        assert not incremental_curation_funnel_stored(
            again, prefix, update_index=False).collect()
    finally:
        for t in tables:
            spark.sql(f"DROP TABLE IF EXISTS {prefix}{t}")
