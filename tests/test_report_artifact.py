"""Report artifact assembly (reference analyze_and_report.py:76-157,
stats_tests.py:36-102) against hand-written result records — runs fully
headless: matplotlib and scipy are absent in this image, so the PDF is
skipped and the test asserts the text artifact + Welch t/Bonferroni table.
"""

import json
import math
import os

from semantic_vector_search_system_spark.plans.report_artifact import (
    assemble_report,
    pairwise_tests,
)
from semantic_vector_search_system_spark.plans.report import welch_t_stat


def _write_records(results_dir):
    os.makedirs(results_dir, exist_ok=True)
    recs = []
    # H1: two DBs, two sizes, 3 repeats each; db_b systematically slower
    for db, base in (("db_a", 1.0), ("db_b", 2.0)):
        for n in (1000, 10000):
            for rep in range(3):
                recs.append({
                    "config": {"hypothesis": "H1_ingest", "n_docs": n,
                               "target_db": db, "model_name": "hashing"},
                    "n_docs": n,
                    "encode_total_s": base * (n / 1000) + 0.1 * rep,
                    "metrics": {"ingest": {"total_items": n}},
                })
    # H3: two models, one size; model effect on p_at_5
    for model, p5 in (("bert", 0.60), ("sentence_transformer", 0.80)):
        for rep in range(3):
            recs.append({
                "config": {"hypothesis": "H3_model_effect", "n_docs": 1000,
                           "target_db": "local", "model_name": model},
                "n_docs": 1000,
                "encode_total_s": 1.0,
                "metrics": {"p_at_5": p5 + 0.01 * rep, "map": p5 - 0.1},
            })
    # one error sentinel: must be excluded from every table
    recs.append({
        "config": {"hypothesis": "H1_ingest", "n_docs": 1000,
                   "target_db": "db_a", "model_name": "hashing"},
        "n_docs": 1000,
        "error": "RuntimeError: boom",
    })
    for i, rec in enumerate(recs):
        with open(os.path.join(results_dir, f"auto_test_{i}.json"), "w") as f:
            json.dump(rec, f)


def test_assemble_report_headless(spark, tmp_path):
    results_dir = str(tmp_path / "results")
    out_dir = str(tmp_path / "doc")
    _write_records(results_dir)

    info = assemble_report(spark, results_dir, out_dir)
    assert os.path.exists(info["text"])
    assert os.path.exists(info["conclusions"])
    assert info["pdf"] is None  # matplotlib absent in this image
    body = open(info["text"]).read()

    # per-hypothesis sections with group rows
    assert "--- H1_ingest ---" in body
    assert "--- H3_model_effect ---" in body
    assert "db_a" in body and "db_b" in body
    assert "bert" in body and "sentence_transformer" in body

    # medians: H1 db_a n=1000 -> encode_s median of (1.0, 1.1, 1.2) = 1.1;
    # the error sentinel (db_a, n=1000) must NOT have shifted it
    h1_rows = [l for l in body.splitlines() if l.strip().startswith("1000 | db_a")]
    assert any("1.1000" in l or "1.1" in l for l in h1_rows)

    # statistical tests: H1 has 2 sizes x 3 metrics, H3 1 size x 3 metrics
    assert "=== STATISTICAL TESTS ===" in body
    assert "H1_ingest n=1000 metric=encode_s db_a vs db_b method=welch_t" in body
    # scipy absent -> p is '-', but t must be real and negative (db_a faster)
    t_line = next(
        l for l in body.splitlines()
        if l.startswith("H1_ingest n=1000 metric=encode_s")
    )
    assert "t=-" in t_line  # a_mean < b_mean
    assert "p=-" in t_line and "install scipy" in body

    # conclusions file got the appended summary
    concl = open(info["conclusions"]).read()
    assert "=== ANALYSIS SUMMARY ===" in concl


def test_pairwise_tests_welch_and_bonferroni():
    # two groups, one metric, known inputs -> exact Welch t + Bonferroni
    rows = [
        {"hypothesis": "H", "n_docs": 10, "group_val": "a",
         "n_m": 3, "mean_m": 1.0, "var_m": 0.01, "median_m": 1.0},
        {"hypothesis": "H", "n_docs": 10, "group_val": "b",
         "n_m": 3, "mean_m": 2.0, "var_m": 0.04, "median_m": 2.0},
    ]
    tests = pairwise_tests(rows, metrics=("m",))
    assert len(tests) == 1
    t_expected, dof_expected = welch_t_stat(3, 1.0, 0.01, 3, 2.0, 0.04)
    assert math.isclose(tests[0]["t"], t_expected)
    assert math.isclose(tests[0]["dof"], dof_expected)
    # scipy absent: p stays None but the method/t/dof are still reported
    assert tests[0]["method"] == "welch_t"
    assert tests[0]["pvalue"] is None and tests[0]["p_bonf"] is None

    # degenerate: single sample per group -> no test statistic, no crash
    rows1 = [
        {"hypothesis": "H", "n_docs": 10, "group_val": "a",
         "n_m": 1, "mean_m": 1.0, "var_m": None, "median_m": 1.0},
        {"hypothesis": "H", "n_docs": 10, "group_val": "b",
         "n_m": 1, "mean_m": 2.0, "var_m": None, "median_m": 2.0},
    ]
    t1 = pairwise_tests(rows1, metrics=("m",))
    assert t1[0]["t"] is None and t1[0]["method"] is None


def test_report_cli_with_artifact(spark, tmp_path, capsys):
    # CLI path: python -m ... report --results-dir ... --artifact-dir ...
    # (reuses the session-scoped spark by calling _dispatch directly)
    import argparse

    from semantic_vector_search_system_spark.__main__ import _dispatch

    results_dir = str(tmp_path / "results")
    out_dir = str(tmp_path / "doc")
    _write_records(results_dir)
    args = argparse.Namespace(
        action="report", results_dir=results_dir,
        metrics="metrics.p_at_5", artifact_dir=out_dir,
    )
    assert _dispatch(spark, args) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["artifact"]["n_tests"] > 0
    assert os.path.exists(out["artifact"]["text"])
