"""Driver-collect audit (VERDICT r3 "What's wrong" #3).

Every ``.collect()`` in engine source must be individually justified —
either a tiny grouped-aggregate/stats result, an explicitly size-guarded
materialization, or a reference-parity driver loop. This test greps the
package and fails on any NEW collect site, forcing an audit entry here
(with its justification) before it ships. ``toArrow``/``toPandas``
full-relation materializations are held to the same bar.
"""

from __future__ import annotations

import pathlib
import re

PKG = pathlib.Path(__file__).resolve().parents[1] / "semantic_vector_search_system_spark"

# file -> set of justified collect-site line snippets (stripped). A snippet
# change (refactor) must re-justify the site by updating this table.
ALLOWED = {
    "__main__.py": {
        # single-row metrics summary / grouped report aggregates (CLI output)
        "row = evaluate_all(ret, qrels, k_values=_ints(args.k)).collect()[0]",
        "rows = [r.asDict() for r in summary_by_size(ok, metric_cols).collect()]",
    },
    "sources/vectorstores.py": {
        # single aggregate row (count/dim probe before upsert)
        ").collect()[0]",
    },
    "operators/similarity.py": {
        # raise-guarded by max_rows count immediately above (bounded matmul)
        "rows = emb.select(id_col, vec_col).collect()",
        # tiny centroid relation (n_lists rows) for the BLAS IVF kernels
        "crows = centroids.select(cent_id_col, cent_vec_col).collect()",
        # partition-pruning predicate: bounded by queries x nprobe and the
        # max_probed_lists limit+raise guard
        'q_lists.select("cent_id").distinct().limit(max_probed_lists + 1).collect()',
    },
    "operators/quantize.py": {
        # single aggregate row (global min/max for the quantization range)
        ").collect()[0]",
    },
    "operators/search.py": {
        # collect_doc_matrix: raise-guarded by max_rows count above
        "rows = docs.select(id_col, vec_col).collect()",
        # collect_query_matrix: query side is small by construction (<=
        # thousands; the reference samples <=200 queries)
        "qrows = queries.select(qid_col, qvec_col).collect()",
    },
    "plans/experiments.py": {
        # config-memoization anti-join result: O(configs), tiny
        "for r in remaining.collect()",
        # single metrics row per experiment
        'ev = evaluate_all(top.select("qid", "docid", "rank"), qrels, k_values=(5, 10, 20)).collect()[0]',
        # explicitly limit()-bounded query sample (reference parity)
        "q_sample = qvec.limit(min(20, cfg.sample_queries)).collect()",
        # per-query latency loop over the bounded sample (reference's own
        # serial timing loop, run_experiments.py)
        "topk_bruteforce(one, dvec_cached, k=1, predicate=predicate).collect()",
        "k: v for k, v in latency_stats(lat_df).collect()[0].asDict().items()",
    },
    "plans/report_artifact.py": {
        "comp_rows = [r.asDict() for r in grouped_components(flat, metrics).collect()]",
    },
    "plans/report.py": {
        # grouped t-test / rank-sum component rows: O(groups), tiny
        "comp = {r[group_col]: r for r in welch_t_components(results, group_col, metric).collect()}",
        "for r in mann_whitney_components(results, group_col, metric, [g1, g2]).collect()",
    },
    "operators/dedup.py": {
        # strategy probe: limit(threshold+1) + columnar Arrow materialization
        "pairs.select(src_col, dst_col).limit(small_edge_threshold + 1).toArrow()",
    },
}


def _collect_sites() -> dict[str, set[str]]:
    found: dict[str, set[str]] = {}
    pat = re.compile(r"\.(collect|toArrow|toPandas)\(\)")
    for py in sorted(PKG.rglob("*.py")):
        rel = str(py.relative_to(PKG))
        for line in py.read_text().splitlines():
            s = line.strip()
            if s.startswith("#"):
                continue
            if pat.search(s):
                found.setdefault(rel, set()).add(s)
    return found


def test_no_unaudited_driver_collects():
    found = _collect_sites()
    unaudited = {
        f: sorted(snips - ALLOWED.get(f, set()))
        for f, snips in found.items()
        if snips - ALLOWED.get(f, set())
    }
    assert not unaudited, (
        "new driver-side .collect()/.toArrow()/.toPandas() sites need an "
        f"audit entry in {__file__}: {unaudited}"
    )
    stale = {
        f: sorted(set(snips) - found.get(f, set()))
        for f, snips in ALLOWED.items()
        if set(snips) - found.get(f, set())
    }
    assert not stale, f"stale audit entries (code moved/removed): {stale}"
