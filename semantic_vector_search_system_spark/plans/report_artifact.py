"""Report artifact assembly (reference `experiments/analyze_and_report.py`
and `experiments/stats_tests.py`).

The reference glob-loads per-run result records, builds per-hypothesis
median tables and pairwise significance tests, renders plots into
`EXPERIMENTS_REPORT.pdf` and appends a textual summary + Bonferroni table
to `EXPERIMENTS_CONCLUSIONS.txt` (`analyze_and_report.py:76-157`,
`stats_tests.py:36-102`).

Spark-first split of that work:

* everything that scans result rows is ONE DataFrame aggregation —
  per-(hypothesis, n_docs, group) count/mean/variance/median for every
  metric in a single groupBy pass (the records relation can be arbitrarily
  large: at 100 TB scale think "one record per training-pipeline run");
* only the aggregated table (a few rows per hypothesis×size×group) is
  collected; Welch t statistics, p-values (scipy-gated) and the Bonferroni
  correction are driver-side arithmetic over it, exactly where the
  reference runs scipy;
* rendering is artifact-only: a text report is ALWAYS written (this image
  has no matplotlib); the PDF + PNG plots are produced when matplotlib is
  importable, mirroring `plot_summary_by_size`'s gating.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .report import bonferroni, welch_t_stat

#: hypothesis -> the config column its groups are compared on
#: (`analyze_and_report.py:98,119,140`: H1/H2 compare target_db,
#: H3 compares model_name).
COMPARE_COL = {
    "H1_ingest": "target_db",
    "H2_relevance": "target_db",
    "H3_model_effect": "model_name",
    # our grid's short names (plans/experiments.py RunConfig)
    "H1": "target_db",
    "H2": "target_db",
    "H3": "model_name",
}

DEFAULT_METRICS = ("encode_s", "p_at_5", "map")


def flatten_records(records: DataFrame) -> DataFrame:
    """`load_df` (`analyze_and_report.py:30-51`): project nested config/
    metrics structs to flat analysis columns, dropping error sentinels."""
    cols = [
        F.col("config.hypothesis").alias("hypothesis"),
        F.col("config.n_docs").alias("n_docs"),
        F.col("config.target_db").alias("target_db"),
        F.col("config.model_name").alias("model_name"),
        F.col("encode_total_s").alias("encode_s"),
    ]
    mfields = (
        [f.name for f in records.schema["metrics"].dataType.fields]
        if "metrics" in records.columns
        else []
    )
    for m in ("p_at_5", "p_at_10", "p_at_20", "map", "mrr"):
        cols.append(
            F.col(f"metrics.{m}").alias(m) if m in mfields
            else F.lit(None).cast("double").alias(m)
        )
    flat = records.select(*cols)
    if "error" in records.columns:
        flat = flat.filter(records["error"].isNull())
    return flat.filter(F.col("hypothesis").isNotNull())


def grouped_components(flat: DataFrame, metrics: tuple[str, ...]) -> DataFrame:
    """ONE aggregation pass producing, per (hypothesis, n_docs, group
    value), everything the tables AND the Welch tests need: n / mean /
    variance / median for each metric."""
    group_val = F.coalesce(
        *[
            F.when(F.col("hypothesis") == h, F.col(c).cast("string"))
            for h, c in COMPARE_COL.items()
        ],
        F.col("target_db").cast("string"),
    ).alias("group_val")
    aggs = []
    for m in metrics:
        aggs += [
            F.count(m).alias(f"n_{m}"),
            F.avg(m).alias(f"mean_{m}"),
            F.var_samp(m).alias(f"var_{m}"),
            F.expr(f"percentile({m}, 0.5)").alias(f"median_{m}"),
        ]
    return (
        flat.groupBy("hypothesis", "n_docs", group_val)
        .agg(*aggs)
        .orderBy("hypothesis", "n_docs", "group_val")
    )


def pairwise_tests(comp_rows: list, metrics: tuple[str, ...]) -> list[dict]:
    """`stats_tests.py:54-88`: for every (hypothesis, n_docs) with exactly
    two-or-more groups, Welch t between the first two groups (sorted — the
    reference pins pinecone-vs-weaviate / bert-vs-st) per metric, then one
    Bonferroni correction across ALL tests."""
    by_key: dict[tuple, list] = {}
    for r in comp_rows:
        by_key.setdefault((r["hypothesis"], r["n_docs"]), []).append(r)

    try:
        from scipy import stats as sps
    except ImportError:
        sps = None

    tests = []
    for (hyp, n), rows in sorted(by_key.items(), key=lambda kv: (kv[0][0], kv[0][1] or 0)):
        rows = sorted(rows, key=lambda r: r["group_val"] or "")
        if len(rows) < 2:
            continue
        a, b = rows[0], rows[1]
        for m in metrics:
            na, nb = a[f"n_{m}"], b[f"n_{m}"]
            test = {
                "hypothesis": hyp, "n_docs": n, "metric": m,
                "group_a": a["group_val"], "group_b": b["group_val"],
                "a_mean": a[f"mean_{m}"], "b_mean": b[f"mean_{m}"],
                "t": None, "dof": None, "pvalue": None, "method": None,
            }
            if (
                na and nb and na >= 2 and nb >= 2
                and a[f"var_{m}"] and b[f"var_{m}"]
            ):
                t, dof = welch_t_stat(
                    na, a[f"mean_{m}"], a[f"var_{m}"],
                    nb, b[f"mean_{m}"], b[f"var_{m}"],
                )
                test.update(t=t, dof=dof, method="welch_t")
                if sps is not None:
                    test["pvalue"] = float(2 * sps.t.sf(abs(t), dof))
            tests.append(test)

    # Bonferroni across all computed p-values (`stats_tests.py:83-88`)
    with_p = [t for t in tests if t["pvalue"] is not None]
    corrected = bonferroni([t["pvalue"] for t in with_p])
    for t, p_bonf in zip(with_p, corrected):
        t["p_bonf"] = p_bonf
    for t in tests:
        t.setdefault("p_bonf", None)
    return tests


def _fmt(v, nd=4) -> str:
    if v is None:
        return "-"
    if isinstance(v, float):
        return f"{v:.{nd}g}" if abs(v) < 1e-3 or abs(v) >= 1e4 else f"{v:.{nd}f}"
    return str(v)


def render_text(comp_rows: list, tests: list[dict], metrics: tuple[str, ...]) -> str:
    """The report body: per-hypothesis median tables (the PDF's data,
    `analyze_and_report.py:81-143`) + the statistical-test table
    (`stats_tests.py:90-92`)."""
    lines = ["=== EXPERIMENTS REPORT ===", ""]
    by_hyp: dict[str, list] = {}
    for r in comp_rows:
        by_hyp.setdefault(r["hypothesis"], []).append(r)
    for hyp in sorted(by_hyp):
        lines.append(f"--- {hyp} ---")
        header = ["n_docs", "group"] + [f"median_{m}" for m in metrics] + ["n"]
        lines.append("  " + " | ".join(header))
        for r in sorted(by_hyp[hyp], key=lambda r: (r["n_docs"] or 0, r["group_val"] or "")):
            cells = [str(r["n_docs"]), str(r["group_val"])]
            cells += [_fmt(r[f"median_{m}"]) for m in metrics]
            cells.append(str(max(r[f"n_{m}"] for m in metrics)))
            lines.append("  " + " | ".join(cells))
        lines.append("")

    lines.append("=== STATISTICAL TESTS ===")
    if not tests:
        lines.append("(no comparable group pairs found)")
    for t in tests:
        lines.append(
            f"{t['hypothesis']} n={t['n_docs']} metric={t['metric']} "
            f"{t['group_a']} vs {t['group_b']} method={t['method']} "
            f"t={_fmt(t['t'])} p={_fmt(t['pvalue'])} bonf={_fmt(t['p_bonf'])} "
            f"a_mean={_fmt(t['a_mean'])} b_mean={_fmt(t['b_mean'])}"
        )
    if tests and all(t["pvalue"] is None for t in tests):
        lines.append(
            "p-values unavailable (scipy not installed); t/dof reported, "
            "install scipy for p-values"  # mirrors stats_tests.py:51
        )
    return "\n".join(lines) + "\n"


def render_plots(comp_rows: list, metrics: tuple[str, ...], out_dir: str) -> list[str]:
    """PDF + per-figure PNGs (`analyze_and_report.py:78-150`); returns the
    written paths, [] when matplotlib is unavailable (this image)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        from matplotlib.backends.backend_pdf import PdfPages
    except ImportError:
        return []

    plots_dir = os.path.join(out_dir, "plots")
    os.makedirs(plots_dir, exist_ok=True)
    pdf_path = os.path.join(out_dir, "EXPERIMENTS_REPORT.pdf")
    written = []
    by_hyp: dict[str, list] = {}
    for r in comp_rows:
        by_hyp.setdefault(r["hypothesis"], []).append(r)
    with PdfPages(pdf_path) as pdf:
        fig_no = 0
        for hyp in sorted(by_hyp):
            metric = "encode_s" if hyp == "H1_ingest" else next(
                (m for m in metrics if m != "encode_s"), metrics[0]
            )
            fig, ax = plt.subplots(figsize=(6, 4))
            groups: dict[str, list] = {}
            for r in by_hyp[hyp]:
                groups.setdefault(str(r["group_val"]), []).append(r)
            for gname, rows in sorted(groups.items()):
                rows = sorted(rows, key=lambda r: r["n_docs"] or 0)
                ax.plot(
                    [r["n_docs"] for r in rows],
                    [r[f"median_{metric}"] for r in rows],
                    marker="o", label=gname,
                )
            ax.set_xscale("log")
            ax.set_xlabel("n_docs")
            ax.set_ylabel(f"median {metric}")
            ax.set_title(hyp)
            ax.legend()
            pdf.savefig(fig)
            fig_no += 1
            png = os.path.join(plots_dir, f"figure_{fig_no}.png")
            fig.savefig(png)
            written.append(png)
            plt.close(fig)
    written.append(pdf_path)
    return written


def assemble_report(
    spark: SparkSession,
    results_dir: str,
    out_dir: str,
    metrics: tuple[str, ...] = DEFAULT_METRICS,
) -> dict:
    """End-to-end artifact assembly: returns {"text": path, "pdf": path|None,
    "plots": [paths], "n_tests": int, "n_groups": int} and writes
    EXPERIMENTS_REPORT.txt (always), EXPERIMENTS_CONCLUSIONS.txt (append,
    like the reference), and the PDF/PNGs when matplotlib exists."""
    from ..sources.jsonl import read_result_records

    os.makedirs(out_dir, exist_ok=True)
    flat = flatten_records(read_result_records(spark, results_dir))
    comp_rows = [r.asDict() for r in grouped_components(flat, metrics).collect()]
    tests = pairwise_tests(comp_rows, metrics)
    body = render_text(comp_rows, tests, metrics)

    text_path = os.path.join(out_dir, "EXPERIMENTS_REPORT.txt")
    with open(text_path, "w", encoding="utf-8") as f:
        f.write(body)
    concl_path = os.path.join(out_dir, "EXPERIMENTS_CONCLUSIONS.txt")
    with open(concl_path, "a", encoding="utf-8") as f:
        f.write("\n\n=== ANALYSIS SUMMARY ===\n")
        f.write(body)

    plot_paths = render_plots(comp_rows, metrics, out_dir)
    return {
        "text": text_path,
        "conclusions": concl_path,
        "pdf": plot_paths[-1] if plot_paths else None,
        "plots": plot_paths[:-1],
        "n_tests": len(tests),
        "n_groups": len(comp_rows),
    }
