"""Partitioning-fuzz determinism: catalog results must be bit-identical under
perturbed physical configs (TODO: "fuzz the oracle-determinism rules").

The oracle gate hashes values order-insensitively, so any result that depends
on partition count, scan split size, or AQE coalescing would pass one run and
fail the next. This test re-runs a representative slice of the catalog under
several perturbed runtime configs (shuffle partition count, scan split bytes,
AQE coalescing, input repartitioning) and asserts the canonicalized output is
identical to the default-config run.

Query slice covers every determinism-sensitive shape: decimal aggregation
(pricing_summary), broadcast+runtime-filter join (revenue_by_nation), window
top-k with tie-break (top_orders_per_customer, knn_topk), exact percentiles
(event_percentiles), stable-hash sketches (doc_fingerprint, minhash), session
windows (sessionization), and the metrics pipeline (retrieval_quality).
"""

from __future__ import annotations

import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "pricing_summary",
    "revenue_by_nation",
    "top_orders_per_customer",
    "event_percentiles",
    "knn_topk",
    "retrieval_quality",
    "doc_fingerprint",
    "minhash_signatures",
    "sessionization",
    "hourly_event_counts",
    # temporal-arithmetic coverage beyond the original slice: ordered
    # sequences, both as-of strategies, the interval join, and the
    # rank-sum components — every remaining events-family shape that
    # could silently depend on session timezone or join strategy.
    "user_event_sequences",
    "asof_latest_order",
    "asof_grouped_orders",
    "view_purchase_funnel",
    "mannwhitney_components",
    # r4: the deterministic sketch query — KMV bottom-k rank + a float
    # division estimate + a hash-threshold-sampled exact percentile, all of
    # which must be invariant to partitioning and session timezone.
    "sketch_stats",
    # r5: incremental near-dup — minhash + banding + signature-agreement
    # estimate + argmax tie-break, all of which must survive partition
    # scrambling and join-strategy flips.
    "incremental_dedup",
    # r5: greedy per-shard packing — a stateful walk whose bin boundaries
    # must depend only on (shard, id order), never physical partitioning.
    "sequence_packing",
    # r7: BM25 (pinned-association double sums + DECIMAL accumulation +
    # rank tie-breaks), span dedup (keep-first window over hash
    # partitions + ordered reassembly), and PQ (argmin code ties +
    # DECIMAL ADC sums) — each must be invariant to partition scrambling.
    "bm25_topk",
    "span_dedup",
    "ann_pq_topk",
    "quality_classifier_report",
    # r7b: SemDeDup — argmax assignment ties, per-cluster keep-order
    # (lexsort on float cent_sim) and the tiled triangular max must all be
    # invariant to partition scrambling and join-strategy flips.
    "semdedup_keep_one",
    # r7b: bigram LM — count aggs + round-12 DECIMAL mean must be exact
    # under partition scrambling (the whole point of the per-ratio round).
    "bigram_lm_report",
    # r8: IVF+PQ expression pipeline — assignment argmax ties, residual
    # codebook row order, per-(vec, sub) argmin struct-MIN ties and the
    # DECIMAL ADC sum must survive partition scrambling + join flips.
    "ann_ivfpq_topk",
    # r8: BPE training — the per-iteration pair-count argmax (count desc,
    # pair asc) and the greedy rewrite fold must be bit-stable under any
    # partitioning (integer counts; no floats anywhere).
    "bpe_merges",
    # r8: bitext margin mining — two knn rankings, round-12 DECIMAL
    # neighborhood means and the margin argmax must survive partition
    # scrambling and join-strategy flips.
    "bitext_margin_pairs",
    # r8: sliding context windows — the window-count formula and slices
    # are pure narrow expressions; invariance here pins that no
    # partitioning/timezone knob can perturb the emitted samples.
    "context_windows",
    # r8: Lloyd k-means trajectory — assignment argmin struct ties and
    # the DECIMAL-exact mean updates must reproduce the same centroid
    # bits under partition scrambling (iteration t+1 amplifies any
    # iteration-t drift, so 3 rounds is a sensitive detector).
    "kmeans_steps",
    # r8: DSIR selection — hashed-feature counts, three-division IEEE
    # ratios, round-12 DECIMAL means and the global top-k tie-break
    # must survive partition scrambling and join-strategy flips.
    "dsir_selection",
    # r8: prototype selection — the Lloyd chain's determinism plus the
    # bounded-heap per-cluster rank (round-6 dist, vec_id ties) must be
    # invariant to partition scrambling.
    "prototype_sample",
    # r8: leakage-safe splits — LSH chain + min-label components + the
    # hash split must yield identical (doc, group, split) under
    # partition scrambling and join flips (a wrong component label under
    # AQE re-plan would silently move docs across splits).
    "leakage_safe_splits",
    # r8: MMR — greedy trajectories amplify any pool-ranking or marginal
    # drift; round-12 dots + docid ties must hold under scrambling.
    "mmr_diversified_topk",
    # r8: nDCG — literal discount sums in DECIMAL + the knn rank chain
    # must be invariant to partition scrambling.
    "retrieval_ndcg",
    # r8: temperature mixture — the round-12 + DECIMAL sqrt total is the
    # partitioning-sensitive normalizer; weights must be bit-stable.
    "temperature_mixture",
    # r8: the composed curation funnel — four stages chained through
    # joins, an exact population median threshold, and a hash-group
    # dedup; any stage's partitioning sensitivity would shift EVERY
    # downstream survivor count.
    "curation_funnel",
    # r9: the INCREMENTAL funnel — the same stages served over ordered
    # batches with carried hash state; cross-batch anti-joins must not
    # leak partitioning into which batch accepts a hash.
    "stream_curation_funnel",
    # r9: paired-test components — |d| tie groups come from exact
    # DECIMAL-sum doubles, and the signed rank sums (multiples of 0.5)
    # plus var_samp's round-4 must be bit-stable under scrambling.
    "paired_test_components",
    # r10: the crawl capstone — WARC round-trip + URL dedup + snapshot
    # diff + the stored-state funnel; file-split/partitioning of the
    # written archives and every join flip must not move a single
    # (canonical_url, status, accepted) cell.
    "crawl_e2e",
    # r11: the crawl-loop scheduler — two snapshot diffs feed Laplace
    # change rates and a quantized staleness priority; the top-100
    # frontier cut must be partition-invariant (rate/priority are
    # rationals of small integers, the quantizer's home turf).
    "recrawl_priority",
    # r11: the mutable-index lifecycle — write/upsert/delete/compact over
    # parquet generations; the superseded semi-join, tombstone anti-join
    # mask and compaction rewrite must land the SAME live set under
    # partition scrambling and join-strategy flips (a partitioning-
    # dependent mask would silently resurrect or lose generations).
    "ann_index_upsert",
]

# Perturbations of runtime-settable physical knobs. Each tuple is applied on
# top of the session defaults (32 shuffle partitions, 128 MiB splits, AQE on).
PERTURBATIONS = [
    {
        "spark.sql.shuffle.partitions": "3",
        "spark.sql.files.maxPartitionBytes": str(64 * 1024),  # many tiny splits
    },
    {
        "spark.sql.shuffle.partitions": "61",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    },
    # Non-UTC caller session (half-hour offset is the nastiest case): query
    # builders are pure — no per-call session.timeZone pinning — so results
    # must still match because all temporal logic is NTZ wall-clock
    # arithmetic (functions/timeutil.py), never session-timezone casts.
    {"spark.sql.session.timeZone": "Asia/Kolkata"},
    # Physical-strategy flips: no broadcast joins at all (every join becomes
    # shuffle hash/sort-merge — catches results depending on the
    # broadcast-vs-exchange choice; explicit F.broadcast hints still apply,
    # which is what this perturbs *around*), and AQE fully off (static
    # plans; catches reliance on runtime coalescing/skew handling).
    {"spark.sql.autoBroadcastJoinThreshold": "-1"},
    {"spark.sql.adaptive.enabled": "false"},
]


def _canonical(df) -> pd.DataFrame:
    """Order-insensitive, float-tolerant canonical form (mirrors the driver's
    sort-columns-then-hash compare, with 1e-9-scale float rounding)."""
    pdf = df.toPandas()
    pdf = pdf[sorted(pdf.columns)]
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, tuple)) else v
            )
        elif pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(9)
    pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True)
    return pdf


@pytest.fixture(scope="module")
def baselines(spark):
    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    out = {}
    for name in QUERIES:
        out[name] = _canonical(CATALOG[name].builder(spark, SF_DIR))
    return out


@pytest.mark.parametrize("pidx", range(len(PERTURBATIONS)))
def test_catalog_results_invariant_under_partitioning(spark, baselines, pidx):
    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    perturb = PERTURBATIONS[pidx]
    saved = {k: spark.conf.get(k, None) for k in perturb}
    try:
        for k, v in perturb.items():
            spark.conf.set(k, v)
        for name in QUERIES:
            got = _canonical(CATALOG[name].builder(spark, SF_DIR))
            pd.testing.assert_frame_equal(
                got, baselines[name], check_exact=False, rtol=0, atol=1e-9,
                obj=f"{name} under {perturb}",
            )
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


# r9 VERDICT #1/#2: the rows that previously rounded a DOUBLE aggregate
# (AVG / var_samp / SUM of non-binary ratios) and were rebuilt on exact
# DECIMAL component sums. The driver flake that motivated the rebuild
# (paired_test_components, CORRECTNESS_r09) survived the atol-1e-9 fuzz
# above because the pre-round drift was ~1e-13 — only the ROUND output
# flipped, and only under merge orders this suite didn't hit. So these
# rows get a stricter gate: BIT-EXACT equality across a partition-count
# sweep (shuffle partitions 2/8/32/200 × input repartitionings).
ROUND_DECIMAL_ROWS = [
    "paired_test_components",
    "welch_components_by_type",
    "retrieval_quality",
    "self_retrieval_e2e",
    "ann_recall",
    "label_centroids",
    "training_corpus_selection",
]


@pytest.fixture(scope="module")
def exact_baselines(spark):
    """Default-config reference results for the ROUND/DECIMAL rows —
    computed once, before any perturbation touches the session."""
    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    return {
        name: _canonical(CATALOG[name].builder(spark, SF_DIR))
        for name in ROUND_DECIMAL_ROWS
    }


@pytest.mark.parametrize("nparts", [2, 8, 32, 200])
def test_round_decimal_rows_bit_exact_under_partition_sweep(
    spark, exact_baselines, nparts
):
    from semantic_vector_search_system_spark.plans import catalog as cat

    orig_T = cat.T

    def scrambled_T(spark_, sf_dir, name):
        return orig_T(spark_, sf_dir, name).repartition(max(2, nparts // 4))

    saved = spark.conf.get("spark.sql.shuffle.partitions")
    cat.T = scrambled_T
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        for name in ROUND_DECIMAL_ROWS:
            got = _canonical(cat.CATALOG[name].builder(spark, SF_DIR))
            pd.testing.assert_frame_equal(
                got, exact_baselines[name], check_exact=True,
                obj=f"{name} at shuffle.partitions={nparts}",
            )
    finally:
        cat.T = orig_T
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_repartitioned_input_invariant(spark, baselines):
    """Shuffling the input rows arbitrarily (round-robin repartition before
    the query's own plan) must not change results — catches any reliance on
    parquet row order beyond the documented tie-break rules."""
    from pyspark.sql import DataFrame

    from semantic_vector_search_system_spark.plans import catalog as cat

    orig_T = cat.T

    def scrambled_T(spark_, sf_dir, name) -> DataFrame:
        return orig_T(spark_, sf_dir, name).repartition(7)

    cat.T = scrambled_T
    try:
        for name in QUERIES:
            got = _canonical(cat.CATALOG[name].builder(spark, SF_DIR))
            pd.testing.assert_frame_equal(
                got, baselines[name], check_exact=False, rtol=0, atol=1e-9,
                obj=f"{name} with repartitioned inputs",
            )
    finally:
        cat.T = orig_T


def test_paired_components_boundary_data_cross_engine(spark, tmp_path):
    """r10 VERDICT #1: Spark round(double, 4) (BigDecimal HALF_UP on the
    shortest repr) and DuckDB round (scaled-double std::round) DISAGREE at
    exact decimal .5 boundaries — reproduced: round(-4.04515, 4) → Spark
    -4.0452, DuckDB -4.0451. paired_test_components was green on
    /root/testdata yet hash-red on the driver's parquet for two rounds
    because whether mean_d = S1/n lands on such a boundary is
    data-dependent. The fix: the hashed relation emits the RAW exact-sum
    components (s1, s2) and never divides or rounds.

    This test PLANTS the failing shape: 8 user pairs whose diff total is
    S1 = -32.37, so the old mean_d = S1/8 = -4.046250 sat exactly on a
    4-dp half-way point (the old code diverged: Spark -4.0463 vs DuckDB
    -4.0462). Both faces must now agree BIT-EXACTLY on the planted data.
    """
    import datetime

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    diffs = [-4.05] * 5 + [-4.04] * 3  # S1 = -32.37; S1/8 = -4.046250
    assert round(sum(diffs), 2) == -32.37
    eid, rows = 0, []
    for u, d in enumerate(diffs):
        for et, v in (("view", 10.00), ("purchase", round(10.00 + d, 2))):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, 0, eid % 60), u, et, v)
            )
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    entry = CATALOG["paired_test_components"]
    df = entry.builder(spark, str(tmp_path))
    srow = {c: v for c, v in zip(df.columns, df.collect()[0])}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    res = con.execute(entry.oracle)
    orow = {d[0]: v for d, v in zip(res.description, res.fetchone())}

    assert sorted(srow) == sorted(orow)
    # No divided/rounded column may survive in the hashed relation: the
    # moments travel as raw power sums.
    assert "s1" in srow and "s2" in srow and "mean_d" not in srow
    for c in srow:
        assert srow[c] == orow[c], (c, srow[c], orow[c])  # bit-exact
    assert srow["n"] == 8 and srow["s1"] == orow["s1"]


def _write_events(tmp_path, values, event_types=None):
    """Tiny events.parquet with the real table's schema and planted values."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(values)
    if event_types is None:
        event_types = ["view" if i % 2 == 0 else "purchase" for i in range(n)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1, i // 60, i % 60) for i in range(n)],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([i // 2 for i in range(n)], pa.int64()),
            "event_type": pa.array(event_types, pa.string()),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))


# Doubles whose SHORTEST DECIMAL REPR ends in a third-decimal 5 — the r11
# VERDICT #1 repro set: Spark's CAST(double AS DECIMAL(12,2)) (BigDecimal
# HALF_UP on the shortest repr) rounds each UP while DuckDB's (scaled-double
# round) rounds each DOWN, so ANY hashed relation headed by that cast
# diverges cross-engine on data containing one of these.
THIRD_DECIMAL_5 = [4.045, 0.125, 2.675, 1.005, 8.845, 3.555, 10.075]


# Every events-table money row (the `_dec()` purge sweep, r11 VERDICT #3):
# each must be bit-exact cross-engine on a planted events table whose
# values include every known third-decimal-5 boundary double.  TPC-H money
# rows (pricing_summary etc.) share the exact same _cents/_cents_sql
# helpers, so the events sweep covers the idiom.
MONEY_EVENT_ROWS = [
    "welch_components_by_type",
    "event_percentiles",
    "user_event_pivot",
    "user_running_value",
    "hourly_event_counts",
    "sessionization",
    "stream_hourly_counts",
    "stream_sessionize",
    "stream_user_totals_stateful",
]


def test_money_rows_third_decimal_5_cross_engine(spark, tmp_path):
    """r11 VERDICT #3: one 3-dp boundary value in a future driver dataset
    would have flipped every `CAST(double AS DECIMAL(12,2))` money row
    catalog-wide.  After the cents purge, every events-money consumer must
    be bit-exact across engines on PLANTED boundary data — don't wait for
    the driver to hit pricing_summary."""
    import duckdb

    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    values = []
    for i, v in enumerate(THIRD_DECIMAL_5 * 6):
        values.extend([v, 10.00 + v, -v])
    _write_events(tmp_path, values, event_types=[
        ["view", "purchase", "click"][i % 3] for i in range(len(values))
    ])

    from scripts.verify_local import canon, duck_rows

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    for name in MONEY_EVENT_ROWS:
        entry = CATALOG[name]
        df = entry.builder(spark, str(tmp_path))
        cols = df.columns
        raw_rows = [tuple(r) for r in df.collect()]
        srows = sorted(
            tuple("NULL" if v is None else v for v in r) for r in raw_rows
        )
        res = con.execute(entry.oracle)
        ocols = [d[0] for d in res.description]
        assert sorted(cols) == sorted(ocols), name
        oidx = [ocols.index(c) for c in cols]
        orows = sorted(
            tuple("NULL" if r[i] is None else r[i] for i in oidx)
            for r in res.fetchall()
        )
        assert len(srows) == len(orows), name
        for sr, orow in zip(srows, orows):
            for c, sv, ov in zip(cols, sr, orow):
                assert sv == ov, (name, c, sv, ov)  # bit-exact
        # r12 VERDICT #2: the fetchall comparison above is value-exact but
        # TYPE-blind (DuckDB hands hugeint back as a plain int); re-check
        # under the driver-model canon (Arrow materialization, int 3 !=
        # float 3.0 != Decimal 3) so an uncast integer final goes red here
        acols, arows = duck_rows(con.execute(entry.oracle))
        assert canon(raw_rows, cols) == canon(arows, acols), (
            f"{name}: driver-model (type-sensitive) mismatch"
        )


def test_paired_family_third_decimal_5_cross_engine(spark, tmp_path):
    """r11 VERDICT #1: the residual paired_test_components red cell was the
    double→DECIMAL(12,2) cast at the HEAD of the pipeline — itself a
    cross-engine rounding op (4.045 → Spark 4.05, DuckDB 4.04), amplified by
    the Wilcoxon ranks into whole-rank hash breaks.  Local testdata is
    exactly-2-dp, so the cast was boundary-free here and the row stayed
    tri-scale green while red on the driver's ≥3-dp parquet.

    This test PLANTS the driver's shape — every known third-decimal-5
    boundary double as purchase values — and asserts the rebuilt
    cents-quantized pipeline (paired_test_components + all three bisection
    probes) is BIT-EXACT across engines on it."""
    import duckdb

    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    values = []
    for v in THIRD_DECIMAL_5:
        values.extend([10.00, v])  # (view, purchase) per user
    # a couple of negative-boundary users too (FLOOR cents is
    # half-toward-+inf; both faces must share that convention)
    values.extend([10.00, -4.045, 10.00, -0.125])
    _write_events(tmp_path, values)

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'")
    # sanity: the OLD idiom really is divergent on this image for the
    # planted head value (documents why the cents rebuild exists; drop
    # this probe if engine versions ever converge)
    duck_cast = con.execute("SELECT CAST(4.045 AS DECIMAL(12,2))").fetchone()[0]
    spark_cast = spark.sql("SELECT CAST(4.045D AS DECIMAL(12,2))").collect()[0][0]
    assert str(duck_cast) != str(spark_cast), (
        "engines now agree on the double->DECIMAL cast; the cents rebuild "
        "rationale should be re-checked"
    )

    from scripts.verify_local import canon, duck_rows

    for name in (
        "paired_test_components",
        "paired_pairs_probe",
        "paired_moments_probe",
        "paired_wilcoxon_probe",
    ):
        entry = CATALOG[name]
        df = entry.builder(spark, str(tmp_path))
        cols = df.columns
        raw_rows = [tuple(r) for r in df.collect()]
        srows = sorted(raw_rows)
        res = con.execute(entry.oracle)
        ocols = [d[0] for d in res.description]
        orows = sorted(tuple(r) for r in res.fetchall())
        assert sorted(cols) == sorted(ocols), name
        # align column order before comparing values
        oidx = [ocols.index(c) for c in cols]
        orows = sorted(tuple(r[i] for i in oidx) for r in orows)
        assert len(srows) == len(orows), name
        for sr, orow in zip(srows, orows):
            for c, sv, ov in zip(cols, sr, orow):
                sv = int(sv) if isinstance(sv, bool) else sv
                assert sv == ov, (name, c, sv, ov)  # bit-exact
        # r12 VERDICT #2: the r12 red cells were value-identical and
        # TYPE-divergent — exactly what the fetchall loop above cannot
        # see.  The driver-model canon (Arrow materialization) fails any
        # uncast hugeint final here, on planted boundary data.
        acols, arows = duck_rows(con.execute(entry.oracle))
        assert canon(raw_rows, cols) == canon(arows, acols), (
            f"{name}: driver-model (type-sensitive) mismatch"
        )


def _write_tpch(tmp_path) -> None:
    """Plant the seven TPC-H-ish tables with every THIRD_DECIMAL_5 boundary
    double in every money column, matching the driver's physical schema
    snapshot (tests/conftest.py EXPECTED_SCHEMAS)."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    def money(n, base=0.0):
        out = []
        for i in range(n):
            v = THIRD_DECIMAL_5[i % len(THIRD_DECIMAL_5)]
            out.append([base + v, base + 10.0 + v, base - v][i % 3])
        return out

    ts = pa.timestamp("us")

    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], pa.int32()),
        "r_name": pa.array(["AFRICA", "AMERICA"], pa.string()),
    }), str(tmp_path / "region.parquet"))

    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1, 2], pa.int32()),
        "n_name": pa.array(["ALGERIA", "BRAZIL", "CANADA"], pa.string()),
        "n_regionkey": pa.array([0, 1, 0], pa.int32()),
    }), str(tmp_path / "nation.parquet"))

    nc = 12  # custkeys 11/12 get no orders (anti/semi-join coverage)
    pq.write_table(pa.table({
        "c_custkey": pa.array(list(range(1, nc + 1)), pa.int64()),
        "c_name": pa.array([f"Customer#{i}" for i in range(1, nc + 1)], pa.string()),
        "c_nationkey": pa.array([i % 3 for i in range(nc)], pa.int32()),
        "c_acctbal": pa.array(money(nc), pa.float64()),
        "c_mktsegment": pa.array(
            [["BUILDING", "MACHINERY", "HOUSEHOLD"][i % 3] for i in range(nc)],
            pa.string()),
    }), str(tmp_path / "customer.parquet"))

    ns = 4
    pq.write_table(pa.table({
        "s_suppkey": pa.array(list(range(1, ns + 1)), pa.int64()),
        "s_name": pa.array([f"Supplier#{i}" for i in range(1, ns + 1)], pa.string()),
        "s_nationkey": pa.array([i % 3 for i in range(ns)], pa.int32()),
        "s_acctbal": pa.array(money(ns), pa.float64()),
    }), str(tmp_path / "supplier.parquet"))

    npart = 5
    pq.write_table(pa.table({
        "p_partkey": pa.array(list(range(1, npart + 1)), pa.int64()),
        "p_name": pa.array([f"part {i}" for i in range(npart)], pa.string()),
        "p_brand": pa.array([f"Brand#{i % 2}" for i in range(npart)], pa.string()),
        "p_type": pa.array([["ANODIZED", "BURNISHED", "PLATED"][i % 3]
                            for i in range(npart)], pa.string()),
        "p_size": pa.array([1 + (i * 7) % 50 for i in range(npart)], pa.int32()),
        "p_retailprice": pa.array(money(npart, base=100.0), pa.float64()),
    }), str(tmp_path / "part.parquet"))

    no = 20  # half the dates inside [1996, 1998) for the revenue window
    pq.write_table(pa.table({
        "o_orderkey": pa.array(list(range(1, no + 1)), pa.int64()),
        "o_custkey": pa.array([(i % 10) + 1 for i in range(no)], pa.int64()),
        "o_orderstatus": pa.array([["O", "F"][i % 2] for i in range(no)], pa.string()),
        "o_totalprice": pa.array(money(no, base=1000.0), pa.float64()),
        "o_orderdate": pa.array(
            [datetime.datetime(1995 + (i % 4), 1 + (i % 12), 1 + i)
             for i in range(no)], ts),
        "o_orderpriority": pa.array(
            [["1-URGENT", "3-MEDIUM", "5-LOW"][i % 3] for i in range(no)],
            pa.string()),
    }), str(tmp_path / "orders.parquet"))

    nl = 40  # discounts straddle the 0.03..0.07 band with 3-dp-5 boundaries
    discounts = [[0.045, 0.055, 0.065, 0.005, 0.095][i % 5] for i in range(nl)]
    pq.write_table(pa.table({
        "l_orderkey": pa.array([(i % no) + 1 for i in range(nl)], pa.int64()),
        "l_partkey": pa.array([(i % npart) + 1 for i in range(nl)], pa.int64()),
        "l_suppkey": pa.array([(i % ns) + 1 for i in range(nl)], pa.int64()),
        "l_linenumber": pa.array([(i % 7) + 1 for i in range(nl)], pa.int32()),
        "l_quantity": pa.array(
            [[8.045, 23.125, 30.675, 47.005][i % 4] for i in range(nl)],
            pa.float64()),
        "l_extendedprice": pa.array(money(nl, base=500.0), pa.float64()),
        "l_discount": pa.array(discounts, pa.float64()),
        "l_tax": pa.array([[0.015, 0.045, 0.075][i % 3] for i in range(nl)],
                          pa.float64()),
        "l_returnflag": pa.array([["A", "N", "R"][i % 3] for i in range(nl)],
                                 pa.string()),
        "l_linestatus": pa.array([["O", "F"][i % 2] for i in range(nl)],
                                 pa.string()),
        "l_shipdate": pa.array(
            [datetime.datetime(1995 + (i % 5), 1 + (i % 12), 1 + (i % 28))
             for i in range(nl)], ts),
    }), str(tmp_path / "lineitem.parquet"))


# Every TPC-H-table money row: each must match its oracle on planted
# boundary data under the DRIVER-MODEL comparison (Arrow materialization +
# type-sensitive canon) AND be value-bit-exact.  Five of these
# (revenue_by_nation, segment_order_stats, brand_price_stats,
# urgent_orders_by_year, supplier_balance_by_nation) were rebuilt by the
# r12 cents purge while parked — this is their pre-driver-check gate.
TPCH_MONEY_ROWS = [
    "pricing_summary",
    "revenue_filter",
    "revenue_by_nation",
    "segment_order_stats",
    "customers_without_orders",
    "brand_price_stats",
    "urgent_orders_by_year",
    "supplier_balance_by_nation",
    "global_top_spenders",
    "part_type_revenue",
    "cube_order_stats",
    "region_customer_rollup",
]


def test_tpch_money_rows_third_decimal_5_cross_engine(spark, tmp_path):
    """r12 VERDICT #3's risk, closed locally before the driver sees it: the
    cents purge rewrote 8 money rows that were PARKED in r12, so their
    first driver check on ≥3-dp parquet is r13.  Plant every known
    third-decimal-5 boundary double into every TPC-H money column
    (acctbal, totalprice, retailprice, extendedprice, discount, quantity,
    tax) and assert every TPC-H money consumer matches its oracle under
    the driver-model comparison — order-insensitive, TYPE-SENSITIVE canon
    over Arrow-materialized DuckDB results — and is value-bit-exact."""
    import duckdb

    from scripts.verify_local import canon, canon_value, duck_rows
    from semantic_vector_search_system_spark.plans.catalog import CATALOG

    _write_tpch(tmp_path)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{tmp_path}/{t}.parquet'"
        )

    for name in TPCH_MONEY_ROWS:
        entry = CATALOG[name]
        df = entry.builder(spark, str(tmp_path))
        cols = df.columns
        srows = [tuple(r) for r in df.collect()]
        ocols, orows = duck_rows(con.execute(entry.oracle))
        assert sorted(cols) == sorted(ocols), name
        assert len(srows) > 0, f"{name}: planted data produced no rows"
        # driver-model hash equality (type-sensitive)
        assert canon(srows, cols) == canon(orows, ocols), name
        # bit-exactness beyond canon's 9 significant digits: pair rows by
        # canon string (equal by the assert above), compare raw values
        oidx = [ocols.index(c) for c in cols]
        skey = sorted(srows, key=lambda r: [canon_value(v) for v in r])
        okey = sorted(
            (tuple(r[i] for i in oidx) for r in orows),
            key=lambda r: [canon_value(v) for v in r],
        )
        for sr, orow in zip(skey, okey):
            for c, sv, ov in zip(cols, sr, orow):
                sv = int(sv) if isinstance(sv, bool) else sv
                assert sv == ov, (name, c, sv, ov)
