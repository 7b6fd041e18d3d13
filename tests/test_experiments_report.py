"""Experiment grid + reporting/statistics semantics."""

from __future__ import annotations

import pytest

from semantic_vector_search_system_spark.plans.experiments import (
    RunConfig,
    build_configs,
    filter_unrun_configs,
    run_config,
)
from semantic_vector_search_system_spark.plans.report import (
    bonferroni,
    mann_whitney_u,
    paired_tests,
    summary_by_size,
    valid_runs,
    welch_t_stat,
    welch_t_test,
)


def test_build_configs_grid_shape():
    cfgs = build_configs(
        local_only=True,
        h1_sizes=(100, 200), h2_sizes=(100,), h3_sizes=(100,),
        h1_batches=(10, 20), h1_repeats=2, models=("hashing", "tfidf"),
    )
    h1 = [c for c in cfgs if c.hypothesis == "H1"]
    h2 = [c for c in cfgs if c.hypothesis == "H2"]
    h3 = [c for c in cfgs if c.hypothesis == "H3"]
    assert len(h1) == 2 * 2 * 2  # sizes x batches x repeats
    assert len(h2) == 2          # modes
    assert len(h3) == 2          # models
    assert {c.search_mode for c in h2} == {"vector", "hybrid"}


def test_memoization_anti_join(spark):
    cfgs = build_configs(local_only=True, h1_sizes=(100,), h2_sizes=(), h3_sizes=(),
                         h1_batches=(10,), h1_repeats=2)
    done = spark.createDataFrame(
        [("H1", 100, "local", 10, "hashing", "vector", 0)],
        "hypothesis string, n_docs long, target_db string, batch_size long, "
        "model_name string, search_mode string, repeat long",
    )
    remaining = filter_unrun_configs(spark, cfgs, done)
    assert len(remaining) == 1 and remaining[0].repeat == 1


def test_run_config_h1_and_h3(spark, tmp_path):
    h1 = run_config(
        spark, RunConfig("H1", 200, "local", 50, "hashing", 32, 10), str(tmp_path)
    )
    assert h1["metrics"]["ingest"]["total_items"] == 200
    assert h1["encode_total_s"] >= 0

    h3 = run_config(
        spark, RunConfig("H3", 200, "local", None, "hashing", 64, 10), str(tmp_path)
    )
    m = h3["metrics"]
    assert 0.0 <= m["p_at_5"] <= 1.0 and 0.0 <= m["map"] <= 1.0
    # self-retrieval with planted keywords + prefix queries: should hit often
    assert m["r_at_20"] > 0.5


def test_run_config_h2_hybrid_mode(spark, tmp_path):
    rec = run_config(
        spark, RunConfig("H2", 150, "local", None, "hashing", 32, 5, "hybrid"), str(tmp_path)
    )
    assert rec["config"]["search_mode"] == "hybrid"
    assert "map" in rec["metrics"]


def test_report_summaries_and_stats(spark):
    rows = [
        (10, "m1", 0.5), (10, "m1", 0.7), (10, "m2", 0.2), (10, "m2", 0.4),
        (100, "m1", 0.3), (100, "m1", None),
    ]
    df = spark.createDataFrame(rows, "n_docs long, model_name string, p_at_5 double")
    ok = valid_runs(df, ["p_at_5"])
    assert ok.count() == 5
    summ = {r["n_docs"]: r["mean_p_at_5"] for r in summary_by_size(ok, ["p_at_5"]).collect()}
    assert summ[10] == pytest.approx(0.45)

    t, dof = welch_t_stat(10, 1.0, 0.04, 10, 0.8, 0.09)
    # scipy cross-check when available
    scipy = pytest.importorskip("scipy")
    import numpy as np

    rng = np.random.RandomState(0)
    a = rng.normal(1.0, 0.2, 10)
    b = rng.normal(0.8, 0.3, 10)
    from scipy import stats as sps

    expected = sps.ttest_ind(a, b, equal_var=False)
    t2, dof2 = welch_t_stat(len(a), a.mean(), a.var(ddof=1), len(b), b.mean(), b.var(ddof=1))
    assert t2 == pytest.approx(expected.statistic)


def test_welch_and_mannwhitney_on_dataframe(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5]] + [("b", float(v)) for v in [3, 4, 5, 6, 7]]
    df = spark.createDataFrame(rows, "grp string, metric double")
    w = welch_t_test(df, "grp", "metric", "a", "b")
    assert w["t"] < 0 and w["n1"] == 5
    scipy = pytest.importorskip("scipy")
    from scipy import stats as sps

    expected = sps.ttest_ind([1, 2, 3, 4, 5], [3, 4, 5, 6, 7], equal_var=False)
    assert w["t"] == pytest.approx(expected.statistic)
    assert w["p_value"] == pytest.approx(expected.pvalue)

    u = mann_whitney_u(df, "grp", "metric", "a", "b")
    expected_u = sps.mannwhitneyu([1, 2, 3, 4, 5], [3, 4, 5, 6, 7])
    assert min(u["u"], u["n1"] * u["n2"] - u["u"]) == pytest.approx(
        min(expected_u.statistic, 25 - expected_u.statistic)
    )


def test_bonferroni_and_paired():
    assert bonferroni([0.01, 0.4, 0.9]) == [0.03, 1.0, 1.0]
    out = paired_tests([1.0, 2.0, 3.0, 4.0], [1.1, 2.3, 3.1, 4.4])
    assert out["paired_t"] != 0


def _py_paired_components(before, after):
    """Pure-python reference for the distributed paired components."""
    diffs = [a - b for a, b in zip(after, before)]
    n = len(diffs)
    s1 = sum(diffs)
    s2 = sum(d * d for d in diffs)
    nz = [d for d in diffs if d != 0]
    # tie-averaged ranks of |d|
    from collections import Counter

    cnt = Counter(abs(d) for d in nz)
    avg_rank, cum = {}, 0
    for v in sorted(cnt):
        avg_rank[v] = cum + (cnt[v] + 1) / 2.0
        cum += cnt[v]
    w_plus = sum(avg_rank[abs(d)] for d in nz if d > 0)
    w_minus = sum(avg_rank[abs(d)] for d in nz if d < 0)
    tie_term = sum(c**3 - c for c in cnt.values())
    return n, s1, s2, len(nz), w_plus, w_minus, tie_term


def test_paired_components_matches_python_reference(spark):
    """r8 VERDICT #7: the distributed paired-test components (one-row
    relation; sample never collected) against a python oracle — planted
    ties in |d|, zero diffs (dropped for Wilcoxon, kept for t), and
    sign asymmetry; identical under repartitioning."""
    from semantic_vector_search_system_spark.plans.report import (
        paired_components,
    )

    before = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.5, 9.0, 2.5, 0.5]
    after = [1.5, 1.5, 3.0, 6.0, 5.5, 8.0, 7.0, 9.5, 4.5, 0.5]
    # diffs: 0.5 -0.5 0 2 0.5 2 -0.5 0.5 2 0  -> |d| ties at 0.5 and 2
    df = spark.createDataFrame(
        list(zip(before, after)), "before_v double, after_v double"
    )
    want = _py_paired_components(before, after)
    for parts in (1, 7):
        row = (
            paired_components(df.repartition(parts), "before_v", "after_v")
            .collect()[0]
        )
        got = (
            row["n"], row["s1"], row["s2"], row["n_nonzero"],
            row["w_plus"], row["w_minus"], row["tie_term"],
        )
        assert got[0] == want[0] and got[3] == want[3] and got[6] == want[6]
        assert got[1] == pytest.approx(want[1], abs=1e-12)
        assert got[2] == pytest.approx(want[2], rel=1e-12)
        # rank sums are multiples of 0.5 -> exact doubles, bitwise equal
        assert got[4] == want[4] and got[5] == want[5]


def test_paired_components_all_zero_diffs(spark):
    from semantic_vector_search_system_spark.plans.report import (
        paired_components,
        paired_tests_distributed,
    )

    df = spark.createDataFrame(
        [(1.0, 1.0), (2.0, 2.0), (3.0, 3.0)], "b double, a double"
    )
    row = paired_components(df, "b", "a").collect()[0]
    assert row["n"] == 3 and row["n_nonzero"] == 0
    assert row["w_plus"] == 0.0 and row["w_minus"] == 0.0
    out = paired_tests_distributed(df, "b", "a")
    assert out["paired_t"] is None and out["wilcoxon"] is None


def test_paired_tests_distributed_scipy_crosscheck(spark):
    """Statistics AND p-values against scipy (ttest_rel; wilcoxon with
    zero_method='wilcox', correction=False, normal approximation) —
    the contract the docstring promises. Gated on scipy presence."""
    from semantic_vector_search_system_spark.plans.report import (
        paired_tests_distributed,
    )

    before = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.5, 9.0, 2.5, 0.5, 11.0, 3.5]
    after = [1.5, 1.5, 3.0, 6.0, 5.5, 8.0, 7.0, 9.5, 4.5, 0.5, 13.0, 3.0]
    df = spark.createDataFrame(
        list(zip(before, after)), "before_v double, after_v double"
    )
    out = paired_tests_distributed(df, "before_v", "after_v")
    assert out["n"] == 12
    scipy = pytest.importorskip("scipy")  # noqa: F841
    from scipy import stats as sps

    t_stat, t_p = sps.ttest_rel(after, before)
    assert out["paired_t"] == pytest.approx(float(t_stat), rel=1e-12)
    assert out["paired_t_p"] == pytest.approx(float(t_p), rel=1e-12)
    import numpy as np

    diffs = np.subtract(after, before)
    try:
        w = sps.wilcoxon(
            diffs, zero_method="wilcox", correction=False, method="approx"
        )
    except TypeError:  # older scipy spells it mode=
        w = sps.wilcoxon(
            diffs, zero_method="wilcox", correction=False, mode="approx"
        )
    assert out["wilcoxon"] == pytest.approx(float(w.statistic))
    assert out["wilcoxon_p"] == pytest.approx(float(w.pvalue), rel=1e-9)


def test_h3_record_includes_query_latency(spark, tmp_path):
    rec = run_config(
        spark, RunConfig("H3", 120, "local", None, "hashing", 32, 5), str(tmp_path)
    )
    ql = rec["metrics"]["query_latency"]
    assert ql["mean_s"] > 0 and ql["p99_s"] >= ql["p50_s"]
    assert ql["qps"] > 0


def test_runner_to_report_roundtrip(spark, tmp_path):
    """Grid -> result records -> JSON sink -> glob read -> summary (the full
    §3.2 -> §3.3 lifecycle)."""
    import json

    from semantic_vector_search_system_spark.plans.report import (
        summary_by_size,
        valid_runs,
    )

    results_dir = tmp_path / "results"
    results_dir.mkdir()
    for i, n in enumerate([100, 100, 200]):
        rec = run_config(
            spark, RunConfig("H3", n, "local", None, "hashing", 32, 4, "vector", i), str(tmp_path)
        )
        flat = {
            "hypothesis": rec["config"]["hypothesis"],
            "n_docs": rec["n_docs"],
            "model_name": rec["config"]["model_name"],
            "p_at_5": rec["metrics"]["p_at_5"],
            "map": rec["metrics"]["map"],
        }
        (results_dir / f"auto_test_h3_{n}_{i}.json").write_text(json.dumps(flat))

    from semantic_vector_search_system_spark.sources.jsonl import read_result_records

    res = read_result_records(spark, str(results_dir))
    ok = valid_runs(res, ["p_at_5", "map"])
    assert ok.count() == 3
    summ = summary_by_size(ok, ["p_at_5", "map"]).collect()
    assert [r["n_docs"] for r in summ] == [100, 200]


def test_h3_model_effect_grid_two_real_encoders(spark, tmp_path):
    """r5 VERDICT #6: the H3 embedding-model-effect experiment end-to-end
    with TWO real encoders — the hashing expression encoder vs the
    numpy mini-transformer (real tensor math through the transformer UDF
    path) — through the REAL grid path: build_configs H3 branch ->
    run_configs_and_collect -> per-run JSON records -> glob read ->
    per-(n_docs, model) summary in the BASELINE.md §model-effect table
    shape -> paired tests across sizes (reference
    auto_run_tests.py:641-656 + produce_h3_model_comparison.py)."""
    import json

    from semantic_vector_search_system_spark.plans.experiments import (
        build_configs,
        run_configs_and_collect,
    )
    from semantic_vector_search_system_spark.plans.report import (
        paired_tests,
        summary_by_size_and_model,
        valid_runs,
    )
    from semantic_vector_search_system_spark.sources.jsonl import (
        read_result_records,
    )

    sizes = (200, 400, 600)
    configs = build_configs(
        local_only=True, h1_sizes=(), h2_sizes=(), h3_sizes=sizes,
        models=("hashing", "numpy_mini"),
    )
    assert len(configs) == 6 and all(c.hypothesis == "H3" for c in configs)
    # keep the per-config latency sample small: 4 single-query timed jobs
    configs = [
        RunConfig(c.hypothesis, c.n_docs, c.target_db, c.batch_size,
                  c.model_name, c.dim, 4, c.search_mode, c.repeat)
        for c in configs
    ]
    records = run_configs_and_collect(spark, configs, str(tmp_path))
    assert len(records) == 6 and not any("error" in r for r in records)

    results_dir = tmp_path / "results"
    results_dir.mkdir()
    for i, rec in enumerate(records):
        flat = {
            "hypothesis": rec["config"]["hypothesis"],
            "n_docs": rec["n_docs"],
            "model_name": rec["config"]["model_name"],
            "p_at_5": rec["metrics"]["p_at_5"],
            "r_at_5": rec["metrics"]["r_at_5"],
            "map": rec["metrics"]["map"],
            "mean_query_s": rec["metrics"]["query_latency"]["mean_s"],
        }
        (results_dir / f"auto_test_h3m_{i}.json").write_text(json.dumps(flat))

    res = read_result_records(spark, str(results_dir))
    ok = valid_runs(res, ["p_at_5", "map"])
    summ = summary_by_size_and_model(
        ok, ["p_at_5", "r_at_5", "map", "mean_query_s"]
    ).collect()
    # BASELINE.md §model-effect table shape: one row per (n_docs, model),
    # columns p@5 / r@5 / MAP / mean query s
    assert [(r["n_docs"], r["model_name"]) for r in summ] == [
        (n, m) for n in sizes for m in ("hashing", "numpy_mini")
    ]
    for r in summ:
        assert 0.0 <= r["mean_p_at_5"] <= 1.0
        assert 0.0 <= r["mean_map"] <= 1.0
        assert r["mean_mean_query_s"] > 0
    # paired per-size model comparison (A13): hashing vs numpy_mini p@5
    by_model = {
        m: [r["mean_p_at_5"] for r in summ if r["model_name"] == m]
        for m in ("hashing", "numpy_mini")
    }
    out = paired_tests(by_model["hashing"], by_model["numpy_mini"])
    assert set(out) == {"paired_t", "paired_t_p", "wilcoxon", "wilcoxon_p"}


def test_error_sentinel_records(spark, tmp_path):
    from semantic_vector_search_system_spark.plans.experiments import (
        run_configs_and_collect,
    )

    good = RunConfig("H1", 50, "local", 10, "hashing", 16, 5)
    bad = RunConfig("H1", 50, "local", 10, "no_such_model", 16, 5)
    out = run_configs_and_collect(spark, [good, bad], str(tmp_path))
    assert len(out) == 2
    assert "error" not in out[0]
    assert "error" in out[1] and "no_such_model" in out[1]["error"]


def test_plot_gated_without_matplotlib(tmp_path):
    from semantic_vector_search_system_spark.plans.report import plot_summary_by_size

    rows = [{"n_docs": 10, "m": 0.5}, {"n_docs": 100, "m": 0.4}]
    ok = plot_summary_by_size(rows, "m", str(tmp_path / "p.png"))
    # matplotlib absent in this container -> graceful False; if present, file
    assert ok in (True, False)
    if ok:
        assert (tmp_path / "p.png").exists()


def test_memoization_all_none_batch_size(spark):
    # H2/H3-only grids have batch_size=None everywhere; schema inference
    # would fail without the pinned schema
    cfgs = build_configs(local_only=True, h1_sizes=(), h2_sizes=(100,), h3_sizes=(),
                         models=("hashing",))
    assert len(filter_unrun_configs(spark, cfgs, None)) == 2
    done = spark.createDataFrame(
        [("H2", 100, "local", "hashing", "vector", 0)],
        "hypothesis string, n_docs long, target_db string, model_name string, "
        "search_mode string, repeat long",
    )
    remaining = filter_unrun_configs(spark, cfgs, done)
    assert len(remaining) == 1 and remaining[0].search_mode == "hybrid"


def test_mann_whitney_hand_computed_with_ties(spark):
    # a=[1,2,2], b=[2,3]: sorted [1,2,2,2,3]; tie-averaged rank of 2 is 3
    # rank_sum(a)=1+3+3=7 -> U1 = 7 - 3*4/2 = 1; U = min(1, 6-1) = 1
    rows = [("a", 1.0), ("a", 2.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
    df = spark.createDataFrame(rows, "grp string, metric double")
    u = mann_whitney_u(df, "grp", "metric", "a", "b")
    assert u["u"] == 1.0 and u["n1"] == 3 and u["n2"] == 2
