"""Benchmark runner: times the engine's headline queries at a scale-factor
directory and prints JSON metric lines for the driver.

    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 python bench.py

Queries are materialized with a noop write (full computation, no collect
cost, no column pruning of the final projection).

Output protocol: after EVERY completed key a compact cumulative metric JSON
line is re-printed (full detail mirrored to bench_out.json), so a run killed
mid-flight still leaves a parseable line with all completed keys; the final
authoritative line (without "partial") is printed AFTER spark.stop() so no
shutdown output can follow it.  Every printed line is kept under TAIL_BUDGET
chars because the driver parses only the last 2000 characters of stdout
(r6 lesson: a 4425-char line overflowed the window and the round's bench
was recorded parsed:null despite rc=0).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_out.json")


# Synthetic floor probes (not queries): reported under "floors" so the
# headline total stays comparable with prior rounds' query-only sums.
FLOORS: dict[str, float] = {}

# Non-latency quality numbers (ANN recall sweep): reported under "accuracy"
# so they never pollute the seconds-summing headline value.
ACCURACY: dict[str, dict] = {}


def best_of(fn, repeats: int) -> tuple[float, float]:
    """min and spread (max - min) over ``repeats`` timed calls.

    The spread is recorded in query_meta per key (r5 VERDICT #8) so the
    driver can tell a regression from co-tenant contention: BENCH_NOTES
    documents 2-7x spikes on this shared box, and a large spread with an
    unchanged min is contention, not code."""
    times = []
    for _ in range(repeats):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return round(min(times), 3), round(max(times) - min(times), 3)


# The driver captures only the LAST 2000 characters of bench stdout and
# parses the last complete JSON line inside that window (measured from the
# BENCH_r{N}.json artifacts: every round's "tail" field is exactly 2000
# chars).  BENCH_r06 went parsed:null because the r6 final line grew to
# 4425 chars (query_meta prose + accuracy sweep) — longer than the window,
# so the tail held no complete line at all.  Every printed line must
# therefore fit the window with margin; full detail goes to bench_out.json
# (committed) and BENCH_NOTES.md instead of stdout.
TAIL_BUDGET = 1800

# VM-speed normalization anchor (r11 VERDICT #8): cross-round totals were
# being floor-normalized BY HAND in BENCH_NOTES each round because this
# shared box's speed drifts (r11 ran on a microVM whose python_job_floor
# was +12.7% vs r10, inflating every key uniformly).  The final line now
# also carries value_floor_norm = value * (REF_FLOOR / python_job_floor):
# the total this run WOULD have posted on the reference-speed box.
# REF_FLOOR is pinned to the r10 round's measured python_job_floor (the
# round the <=92s target was set against) and must never be re-pinned
# without a BENCH_NOTES entry — re-pinning silently rescales history.
REF_FLOOR = 0.292


def _bench_cpus() -> int | None:
    """Core count this run was invoked with (``$SPARK_GRAFT_CPUS`` — the
    master is ``local[$SPARK_GRAFT_CPUS]``, session.py:40).  Stamped into
    every emitted/mirrored line so the mirror fold can tell runs at
    DIFFERENT core counts apart: the r14 driver's 8-core scaling run
    folded every key down to same-day 32-core minima because
    fold_with_mirror keyed lines on (sf, head) but not cpus, erasing the
    scaling signal it existed to measure (r14 VERDICT #1/"Next #2")."""
    v = os.environ.get("SPARK_GRAFT_CPUS")
    try:
        return int(v) if v else None
    except ValueError:
        return None


def emit(timings: dict, query_meta: dict, sf, *, partial: bool) -> str:
    """Write the full cumulative metric record to bench_out.json and print a
    compact, tail-safe JSON line for the driver.

    Called after EVERY completed key (r4 lesson, VERDICT item 8): the driver
    keeps a finite output tail and parses the last JSON line it finds, so a
    run killed mid-flight — or one whose shutdown produces stderr spam —
    still leaves a parseable record of every key completed so far.  The
    final authoritative line is re-printed after spark.stop() so nothing
    can follow it.

    The printed line carries the required fields (metric/value/unit/
    queries/sf) plus floors/accuracy when they fit; query_meta and any
    field that would push the line past TAIL_BUDGET live only in
    bench_out.json (r6 lesson: a 4425-char line overflows the driver's
    2000-char tail window and the whole bench round is lost).

    FINAL line only (r8 VERDICT #1 — noise-proofing): this shared box runs
    co-tenant load that measures 2-3x the quiet numbers (BENCH_r08's
    official dedup_1M was 17.2 s vs 5.98 s on a quiet run the same day —
    recorded as a 2.2x regression that never happened).  The authoritative
    line therefore folds each key to the MIN across this run and the
    round's recent auto-mirrored clean lines (same sf, <=MIRROR_FOLD_HOURS
    old), and self-identifies noise: keys whose this-run reading exceeds
    1.2x the folded min are listed under "noisy" with their raw reading.
    Raw this-run values always land in bench_out.json ("raw_this_run").
    """
    timings = dict(timings)
    fold_info = None
    raw_this_run = None
    fold_source = None
    head = _git_head() if _MIRROR_ENABLED else None
    cpus = _bench_cpus()
    if not partial and _MIRROR_ENABLED:
        timings, fold_info, raw_this_run, fold_source = fold_with_mirror(
            timings, sf, head=head, cpus=cpus
        )
    pj_floor = FLOORS.get("python_job_floor")
    full = {
        "metric": "headline_queries_total_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        **(
            {
                "value_floor_norm": round(
                    sum(timings.values()) * (REF_FLOOR / pj_floor), 3
                ),
                "ref_floor": REF_FLOOR,
            }
            if pj_floor
            else {}
        ),
        "queries": timings,
        "query_meta": query_meta,
        "sf": sf,
        **({"floors": FLOORS} if FLOORS else {}),
        **({"accuracy": ACCURACY} if ACCURACY else {}),
        **({"partial": True} if partial else {}),
        **({"head": head} if head else {}),
        **({"cpus": cpus} if cpus is not None else {}),
        **({"xrun": fold_info} if fold_info else {}),
        **({"raw_this_run": raw_this_run} if raw_this_run else {}),
        **({"fold_source": fold_source} if fold_source else {}),
    }
    try:
        with open(OUT_PATH, "w") as f:
            f.write(json.dumps(full, indent=1) + "\n")
    except OSError:
        pass
    compact = {
        k: v for k, v in full.items()
        if k not in ("query_meta", "raw_this_run", "fold_source")
    }
    if "accuracy" in compact:
        # the per-entry "metric" prose repeats across entries and lives in
        # bench_out.json; dropping it from the printed line buys ~50 chars
        # of tail headroom per accuracy entry
        compact["accuracy"] = {
            k: {kk: vv for kk, vv in v.items() if kk != "metric"}
            for k, v in compact["accuracy"].items()
        }
    line = json.dumps(compact, separators=(",", ":"))
    # the notes mirror carries the PRE-shed line (full precision, accuracy/
    # floors/xrun intact): BENCH_NOTES.md has no tail budget, so the
    # committed record never loses payloads to the stdout window — the r9
    # run where 43 keys crowded out both the accuracy ladder AND the noise
    # map from the printed line is exactly the case this guards
    full_line = line
    if len(line) > TAIL_BUDGET:
        # cheapest shed first: the third decimal of each per-query second
        # (~1 char/key) costs nothing the driver uses, unlike the payload
        # drops below
        compact["queries"] = {
            k: round(v, 2) for k, v in compact["queries"].items()
        }
        line = json.dumps(compact, separators=(",", ":"))
    # then drop optional payloads (least→most valuable) until the line
    # fits; "xrun" (the noise-fold provenance + noisy-key map) is shed
    # LAST of the optional fields — it is what lets the driver discount
    # noise
    for drop in ("accuracy", "floors", "xrun"):
        if len(line) <= TAIL_BUDGET:
            break
        compact.pop(drop, None)
        line = json.dumps(compact, separators=(",", ":"))
    if len(line) > TAIL_BUDGET:
        # queries alone outgrew the window (~50 keys at 2024 sizes):
        # shed precision, then the OLDEST keys — newest keys are the ones
        # a mid-run kill most needs visible, "value" still sums them all,
        # and bench_out.json always has the full dict. Never print an
        # over-budget line: that is exactly the r6 parsed:null failure.
        compact["queries"] = {
            k: round(v, 2) for k, v in compact["queries"].items()
        }
        line = json.dumps(compact, separators=(",", ":"))
        names = list(compact["queries"])
        omitted = 0
        while len(line) > TAIL_BUDGET and len(names) > 1:
            names.pop(0)
            omitted += 1
            compact["queries"] = {
                k: round(timings[k], 2) for k in names
            }
            compact["queries_omitted"] = omitted
            line = json.dumps(compact, separators=(",", ":"))
    print(line, flush=True)
    if not partial and _MIRROR_ENABLED:
        _mirror_to_notes(full_line)
    return line


# Mirroring happens only for real CLI bench runs (main() flips this):
# tests import emit() directly and must not mutate the committed notes.
_MIRROR_ENABLED = False

NOTES_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_NOTES.md"
)
_MIRROR_HEADER = "## Auto-mirrored final bench lines"


def _mirror_to_notes(line: str) -> None:
    """Append the final authoritative metric line to BENCH_NOTES.md (r7
    VERDICT #8): even if a future driver round's stdout parse fails
    (r4/r6 both lost a round's numbers that way), the committed notes
    carry every completed run's final line. Appended under a dedicated
    trailing section; timestamped so rounds stay distinguishable."""
    import datetime

    stamp = datetime.datetime.now(datetime.timezone.utc).strftime(
        "%Y-%m-%d %H:%MZ"
    )
    entry = f"- {stamp} :: `{line}`\n"
    try:
        text = ""
        if os.path.exists(NOTES_PATH):
            with open(NOTES_PATH) as f:
                text = f.read()
        with open(NOTES_PATH, "a") as f:
            if _MIRROR_HEADER not in text:
                f.write(
                    f"\n{_MIRROR_HEADER}\n\n"
                    "Written by bench.py emit(partial=False) — the final\n"
                    "authoritative line of every completed run, so a\n"
                    "driver-side parse failure can never lose a round's\n"
                    "numbers again.\n\n"
                )
            f.write(entry)
    except OSError:
        pass  # never let notes bookkeeping break the metric line


# A driver round runs ~6 h; clean builder runs from the same round are at
# most this much older than the driver's own run.  Lines older than the
# window (prior rounds — possibly different code) never fold in.
MIRROR_FOLD_HOURS = 36
# a key whose this-run reading exceeds this multiple of its folded min is
# contention, not code (BENCH_NOTES documents 2-3x co-tenant spikes)
NOISY_RATIO = 1.2
# printed-line cap on the self-identifying noisy map (worst by ratio);
# the full map always lands in bench_out.json
NOISY_TOP = 6


def _parse_mirrored_lines(notes_text: str) -> list:
    """(utc datetime, record) for every auto-mirrored final line."""
    import datetime

    out = []
    pat = re.compile(r"^- (\d{4}-\d{2}-\d{2} \d{2}:\d{2})Z :: `(\{.*\})`\s*$")
    for ln in notes_text.splitlines():
        m = pat.match(ln)
        if not m:
            continue
        try:
            stamp = datetime.datetime.strptime(
                m.group(1), "%Y-%m-%d %H:%M"
            ).replace(tzinfo=datetime.timezone.utc)
            rec = json.loads(m.group(2))
        except (ValueError, OverflowError):
            continue  # a malformed historical entry must not kill the bench
        out.append((stamp, rec))
    return out


def _git_head() -> str | None:
    """CODE identity of the benched engine — recorded in every mirrored
    line so the fold can tell 'same code, quieter box' from 'older,
    faster code' (r9 ADVICE: a mid-round commit that genuinely slows a
    query must not hide behind a pre-regression minimum).

    The identity is the git TREE hash of the package at HEAD (first 12
    hex chars), NOT the commit sha: a round interleaves bench runs with
    doc/notes/test commits (including the BENCH_NOTES mirror append
    itself), and a commit-sha gate would wrongly orphan every mirrored
    line after each of them — in particular the driver's own per-round
    run would never fold with the builder's quiet mirrors.  Engine-code
    commits still reset the fold window, which is the regression-masking
    fix the gate exists for.  (bench.py itself is excluded: its edits
    are protocol, not engine — a deliberate timed-region change should
    bump the window by touching the package or pruning the notes.)

    Dirty-tree guard (r10 ADVICE): HEAD describes the COMMITTED tree,
    but the benched code is the WORKING tree.  A run with uncommitted
    package edits (possibly a regression) must not fold against clean
    mirrored minima stamped with the same head — that is exactly the
    masking this gate prevents — so a dirty package returns
    ``<tree>-dirty``, which never matches a mirrored line and resets
    the fold window until the edits are committed."""
    import subprocess

    try:
        cwd = os.path.dirname(os.path.abspath(__file__))
        out = subprocess.run(
            ["git", "rev-parse", "HEAD:semantic_vector_search_system_spark"],
            cwd=cwd, capture_output=True, text=True, timeout=10,
        )
        tree = out.stdout.strip()
        if out.returncode != 0 or not tree:
            return None
        st = subprocess.run(
            ["git", "status", "--porcelain", "--",
             "semantic_vector_search_system_spark"],
            cwd=cwd, capture_output=True, text=True, timeout=10,
        )
        if st.returncode == 0 and st.stdout.strip():
            return f"{tree[:12]}-dirty"
        return tree[:12]
    except (OSError, subprocess.SubprocessError):
        return None


def fold_with_mirror(
    timings: dict, sf, notes_text: str | None = None, now=None,
    max_age_hours: float = MIRROR_FOLD_HOURS, head: str | None = None,
    cpus: int | None = "unset",
) -> tuple[dict, dict | None, dict | None, dict | None]:
    """Fold each key to the min across this run and the round's recent
    mirrored clean lines (r8 VERDICT #1).

    Commit-identity gate (r9 ADVICE): when ``head`` is given, only
    mirrored lines recorded at the SAME commit fold in — a line from
    older code (different or missing "head") is skipped and counted
    under ``fold_info["skipped_other_head"]``, so a commit that
    genuinely slows a query can never keep reporting the pre-regression
    minimum as 'noise'.  ``head=None`` (git unavailable) folds across
    the window as before — the fold_source provenance still names every
    borrowed line.

    CPU-count gate (r15; r14 VERDICT "Next #2"): when ``cpus`` is passed
    (the CLI path always passes ``_bench_cpus()``), only mirrored lines
    recorded at the SAME core count fold in — equality includes
    both-None.  Without this gate the r14 driver's 8-core scaling run
    folded every key to same-day 32-core minima and the scaling block
    read all-1.0 (``suspect_cpus_ignored``).  Mismatches are counted
    under ``fold_info["skipped_other_cpus"]``.  The sentinel default
    ``"unset"`` (parameter omitted entirely — legacy unit-test callers)
    keeps the pre-r15 behavior of ignoring the field.

    Returns (folded_timings, fold_info, raw_this_run, fold_source):
    - folded_timings: per-key min(this run, recent same-sf/-head lines)
    - fold_info: {"runs": N, "window_h": H, "noisy": {key: raw}} where
      "noisy" lists keys whose this-run reading is > NOISY_RATIO x the
      folded min — self-identifying contention for the driver/judge
    - raw_this_run: this run's readings for every folded-down key (full
      provenance, recorded in bench_out.json only)
    - fold_source: per folded-down key, WHICH mirrored line supplied the
      minimum ("<stamp>@<head>") — r9 VERDICT #7's provenance note, in
      bench_out.json only
    Pure given notes_text/now so the protocol is unit-testable; the CLI
    path reads BENCH_NOTES.md and uses wall-clock now.
    """
    import datetime

    if notes_text is None:
        try:
            with open(NOTES_PATH) as f:
                notes_text = f.read()
        except OSError:
            notes_text = ""
    if now is None:
        now = datetime.datetime.now(datetime.timezone.utc)
    minima: dict = {}  # key -> (value, source-line tag)
    runs = 0
    skipped_other_head = 0
    skipped_other_cpus = 0
    for stamp, rec in _parse_mirrored_lines(notes_text):
        if rec.get("sf") != sf:
            continue
        age_h = (now - stamp).total_seconds() / 3600.0
        if not (0 <= age_h <= max_age_hours):
            continue
        if head is not None and (
            head.endswith("-dirty") or rec.get("head") != head
        ):
            # a dirty working tree never folds against ANYTHING — two
            # dirty runs share the marker but not necessarily the code
            skipped_other_head += 1
            continue
        if cpus != "unset" and rec.get("cpus") != cpus:
            # a line recorded at a different (or unstamped) core count is
            # a different machine shape, not a quieter window
            skipped_other_cpus += 1
            continue
        runs += 1
        tag = f"{stamp.strftime('%Y-%m-%d %H:%MZ')}@{rec.get('head') or '?'}"
        for k, v in rec.get("queries", {}).items():
            if isinstance(v, (int, float)) and k in timings:
                if k not in minima or v < minima[k][0]:
                    minima[k] = (v, tag)
    if not runs:
        skips = {
            **({"skipped_other_head": skipped_other_head}
               if skipped_other_head else {}),
            **({"skipped_other_cpus": skipped_other_cpus}
               if skipped_other_cpus else {}),
        }
        info = (
            {"runs": 0, "window_h": max_age_hours, **skips}
            if skips else None
        )
        return dict(timings), info, None, None
    folded, noisy, raw, src = {}, {}, {}, {}
    for k, v in timings.items():
        mv, mtag = minima.get(k, (v, None))
        best = round(min(v, mv), 3)
        folded[k] = best
        if mv < v and mtag:
            src[k] = mtag
        if v > best * NOISY_RATIO:
            noisy[k] = round(v, 2)
            raw[k] = round(v, 3)
    info = {"runs": runs, "window_h": max_age_hours}
    if skipped_other_head:
        info["skipped_other_head"] = skipped_other_head
    if skipped_other_cpus:
        info["skipped_other_cpus"] = skipped_other_cpus
    if noisy:
        # a contended run can flag dozens of keys; the printed line only
        # needs the worst offenders to be self-identifying — cap at the
        # top NOISY_TOP by this-run/folded ratio, count the rest
        # ("noisy_n"), and leave every raw reading in bench_out.json
        info["noisy_n"] = len(noisy)
        top = sorted(
            noisy, key=lambda k: noisy[k] / max(folded[k], 1e-9), reverse=True
        )[:NOISY_TOP]
        info["noisy"] = {k: noisy[k] for k in top}
    return folded, info, (raw or None), (src or None)


def main() -> None:
    global _MIRROR_ENABLED
    _MIRROR_ENABLED = True
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from semantic_vector_search_system_spark.plans.catalog import bench_queries
    from semantic_vector_search_system_spark.session import get_spark

    # Console progress bars write \r-spam to stderr; with the finite tail
    # capture they can displace the metric lines. Off for bench runs.
    spark = get_spark(
        "sivbp-bench",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + parquet footers so per-query numbers measure the query
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    # warm python workers (import numpy/pandas once per worker) so Arrow-UDF
    # queries measure steady-state, not interpreter startup
    import pandas as _pd

    spark.range(0, 64, 1, 64).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    query_meta: dict[str, dict] = {}

    # Floor cost of ANY python-stage job: an empty 32-partition mapInPandas
    # round-trip.  This prices the r4 session-layer changes (UDS worker
    # channel + daemon preload, session.py:53-96) as a tracked driver-side
    # number instead of a builder-side claim (VERDICT r4 item 5): without
    # preload each task pays ~0.2 s of numpy/pandas/pyarrow imports; without
    # UDS each worker pays a TCP+auth handshake.
    floor_plan = spark.range(0, 32, 1, 32).mapInPandas(
        lambda it: (pdf for pdf in it), schema="id long"
    )

    # CPU floor (r13): the scheduling floor is an EMPTY round-trip —
    # it prices scheduler/worker-channel overhead but is blind to
    # co-tenant CPU contention, which hits the compute-bound keys
    # (encode/search/PQ, all numpy kernels) 1.3-1.5x while the empty
    # floor holds steady (observed r12→r13).  A fixed single-thread
    # numpy matmul prices raw CPU throughput so a uniform drift on
    # compute keys is attributable from the record itself.
    import numpy as _np

    _a = _np.random.default_rng(7).standard_normal((512, 512))

    def _matmul_floor():
        x = _a
        for _ in range(8):
            x = _a @ _a
        return x

    def probe_floors(suffix: str) -> None:
        """Both floor probes, keyed ``python_job_floor{suffix}`` /
        ``numpy_cpu_floor{suffix}``.  Floor probes, not queries: kept OUT
        of the headline total so "value" stays comparable with prior
        rounds' query-only sums.  Probed at run START (the value_floor_norm
        anchor) AND at run END (r13 VERDICT #8): both floors used to be
        start-only, so a load spike arriving MID-run — exactly what
        corrupted the r13 ivf_retrain record — was invisible in the record
        of the run it corrupted.  A start/end pair that disagrees >1.3x
        marks every single-repeat key in between as contention-suspect."""
        FLOORS[f"python_job_floor{suffix}"], spread = best_of(
            lambda: floor_plan.write.format("noop").mode("overwrite").save(),
            5,
        )
        query_meta[f"python_job_floor{suffix}"] = {
            "shape": "empty mapInPandas, 32 partitions", "repeats": 5,
            "spread": spread, "since_round": 5 if not suffix else 14,
            "reported_in": "floors",
        }
        FLOORS[f"numpy_cpu_floor{suffix}"], spread = best_of(_matmul_floor, 5)
        query_meta[f"numpy_cpu_floor{suffix}"] = {
            "shape": "8x 512x512 float64 matmul, driver-side single call",
            "repeats": 5, "spread": spread,
            "since_round": 13 if not suffix else 14,
            "reported_in": "floors",
        }

    probe_floors("")
    emit(timings, query_meta, sf, partial=True)

    # Three timed runs per query, report the min: run 1 pays whole-stage
    # codegen compilation + JIT (measured 12.7 s -> 4.6 s -> 3.3 s for the
    # dedup pipeline's long DAG — two runs were not enough to reach steady
    # state); the reference's numbers are means over repeats of an
    # already-warm process, so steady state is the fair compare.
    for name, builder in bench_queries().items():
        timings[name], spread = best_of(
            lambda: builder(spark, sf_dir)
            .write.format("noop")
            .mode("overwrite")
            .save(),
            3,
        )
        query_meta[name] = {**query_meta.get(name, {}), "repeats": 3, "spread": spread}
        emit(timings, query_meta, sf, partial=True)

    # Reference-workload numbers, directly comparable to BASELINE.md:
    # encode throughput (dummy/hashing dim=512) and exact top-1 search
    # latency over 10k / 100k doc corpora with 100 queries.
    from pyspark.sql import functions as F

    from semantic_vector_search_system_spark.datagen import (
        generate_documents,
        generate_queries_and_qrels,
    )
    from semantic_vector_search_system_spark.operators.encode import HashingEncoderFast
    from semantic_vector_search_system_spark.operators.search import (
        collect_doc_matrix,
        collect_query_matrix,
        topk_bruteforce,
    )

    enc = HashingEncoderFast(dim=512)
    # Mode/dtype provenance for keys whose measured work changed across
    # rounds (r3 moved small-N search to broadcast_index + float32) is
    # recorded in query_meta so historical comparisons stay honest.
    # The 1M workload (the reference's largest published size) is ON by
    # default since r4 — its 0.1-0.2x-of-baseline numbers are the headline
    # scale story; repeats are trimmed to keep total bench wall-time bounded.
    # Opt out with SPARK_GRAFT_BENCH_1M=0.
    bench_1m = os.environ.get("SPARK_GRAFT_BENCH_1M", "1") != "0"
    sizes = (10_000, 100_000, 1_000_000) if bench_1m else (10_000, 100_000)
    for n in sizes:
        # partition sizing: ~600 docs/task floor — at 10k docs, 32 tasks are
        # pure scheduling overhead (measured: 16 parts 0.28s vs 32 0.30s vs
        # reference 0.33s)
        nparts = 16 if n <= 20_000 else 32
        docs = generate_documents(spark, n, seed=42, num_partitions=nparts).cache()
        docs.count()  # materialize corpus outside the timed region
        timings[f"encode_{n}_docs"], spread = best_of(
            lambda: enc.encode(docs).write.format("noop").mode("overwrite").save(),
            3,
        )
        query_meta[f"encode_{n}_docs"] = {"repeats": 3, "spread": spread}
        emit(timings, query_meta, sf, partial=True)

        queries, _ = generate_queries_and_qrels(docs, 100, seed=42)
        dvec = enc.encode(docs).select(F.col("id").alias("docid"), "vec").cache()
        dvec.count()
        qvec = enc.encode(queries, text_col="query").select(
            F.col("id").alias("qid"), F.col("vec").alias("qvec")
        )
        # encode + collect the query matrix once, OUTSIDE the timed region —
        # the reference also times search over pre-encoded in-memory query
        # vectors (auto_run_tests.py encodes queries before the search loop)
        qm = collect_query_matrix(qvec)
        # Small N: broadcast_index serving shape — index collected/broadcast
        # once OUTSIDE the timed loop (the reference also loads its memmap
        # index before its query loop), each timed run is a pure search job.
        # Large N: the distributed scan+partial-top-k plan, where scan/score
        # parallelism wins. float32 scoring IS the reference's arithmetic
        # (its memmap index is float32); oracle-checked paths keep float64.
        # The plan is built once and re-executed (prepared-statement shape):
        # broadcast variables are shipped on first use and reused after,
        # exactly like a serving process; per-run rebuild would re-broadcast
        # the index every call and time serialization, not search.
        if n <= 20_000:
            dm = collect_doc_matrix(dvec)
            plan = topk_bruteforce(
                qvec, dvec, k=1, precollected=qm, mode="broadcast_index",
                predocs=dm, score_dtype="float32",
            )
            mode = "broadcast_index"
        else:
            plan = topk_bruteforce(
                qvec, dvec, k=1, precollected=qm, score_dtype="float32"
            )
            mode = "distributed"
        repeats = 5 if n <= 20_000 else 3
        timings[f"search_100q_{n}_docs"], spread = best_of(
            lambda: plan.write.format("noop").mode("overwrite").save(), repeats
        )
        query_meta[f"search_100q_{n}_docs"] = {
            "mode": mode, "score_dtype": "float32", "repeats": repeats,
            "spread": spread, "since_round": 3,
        }
        emit(timings, query_meta, sf, partial=True)

        if n == 100_000:
            # H1 ingest-throughput comparable (BASELINE: 29-61k vectors/s
            # into the mock DB): encode + write through the engine's index
            # sink (zstd parquet — same write speed as snappy at 60% size).
            import shutil
            import tempfile

            from semantic_vector_search_system_spark.sources.parquet_index import (
                write_vector_index,
            )

            idx_dir = tempfile.mkdtemp(prefix="bench_ingest_")
            timings[f"ingest_{n}_docs"], spread = best_of(
                lambda: write_vector_index(enc.encode(docs), f"{idx_dir}/index"),
                2,
            )
            query_meta[f"ingest_{n}_docs"] = {"repeats": 2, "spread": spread}
            emit(timings, query_meta, sf, partial=True)
            shutil.rmtree(idx_dir, ignore_errors=True)

        if n == 1_000_000:
            # ANN serving latency at the reference's largest size: IVF over
            # a cent_id-PARTITIONED parquet index — single-query latency is
            # where IVF beats the batched brute matmul (a 100-query batch
            # probes essentially every one of the 64 lists, so brute's
            # one-matmul-for-all-queries is already optimal there; see
            # similarity.ivf_search_partitioned docstring). Index build
            # (assignment + partitioned write — the analog of the reference
            # building its memmap) runs ONCE outside the timed region; the
            # timed runs are one query: assign -> prune partitions -> score.
            import shutil
            import tempfile

            from semantic_vector_search_system_spark.operators.similarity import (
                ivf_assign_fast,
                ivf_search_partitioned,
                train_ivf_centroids,
            )
            from semantic_vector_search_system_spark.sources.parquet_index import (
                write_vector_index,
            )

            # r8 (r7 VERDICT #5): TRAINED k-means centroids instead of the
            # first-64-rows default — build-time only (outside every timed
            # region; a 20k-row sample bounds the fit at any corpus scale),
            # lifts the whole recall ladder where assignment precision
            # matters most (pinned at test geometry: nprobe=1 recall@10
            # 0.16 -> 0.235). The ladder shift at 1M is reported under
            # "accuracy" (ann_recall_1m / ann_ivfpq_1m).
            cents = train_ivf_centroids(
                dvec, 64, vec_col="vec", seed=7, sample_fraction=0.02
            )
            dl = ivf_assign_fast(
                dvec, cents, id_col="docid", vec_col="vec", nprobe=1
            ).select("docid", "cent_id")
            ivf_dir = tempfile.mkdtemp(prefix="bench_ivf_")
            write_vector_index(
                dvec.join(dl, "docid"), f"{ivf_dir}/index",
                partition_by="cent_id",
            )
            one_q = qvec.limit(1).cache()
            one_q.count()
            # The WHOLE per-query serving path is inside the timed region
            # (r4 ADVICE: plan construction runs the query collect +
            # assignment, which the old code did once outside the loop,
            # under-reporting latency): each repeat rebuilds the plan —
            # collect the query, assign it to lists driver-side, prune
            # partitions, scan + score + merge. Only the per-INDEX state a
            # serving process holds across calls stays outside: the built
            # index and its centroid table (precollected_centroids).
            pre_cents = cents.collect()
            timings[f"ann_ivf_1q_{n}_docs"], spread = best_of(
                lambda: ivf_search_partitioned(
                    spark, f"{ivf_dir}/index", cents, one_q, k=1, nprobe=4,
                    precollected_centroids=pre_cents, merge="driver",
                ).write.format("noop").mode("overwrite").save(),
                3,
            )
            query_meta[f"ann_ivf_1q_{n}_docs"] = {
                "n_lists": 64, "nprobe": 4, "repeats": 3, "spread": spread,
                "since_round": 4,
                "index": "parquet partitionBy(cent_id), zstd",
                "centroids": "kmeans (r8; was first-64-rows)",
                "timed_region": "per-query serving path: query collect + "
                "driver assignment + pruned scan + score + merge (same "
                "honest region as r5; r6: merge='driver' heap-merges the "
                "bounded per-batch partials driver-side — two substantive "
                "jobs, no window exchange)",
            }
            emit(timings, query_meta, sf, partial=True)

            # The pure serving shape (reference-comparable): the query
            # vector is already in driver memory — the reference's loop
            # also searches pre-encoded in-memory query vectors against a
            # loaded index (same contract as the search_100q keys'
            # precollected query matrices). One Spark job per search:
            # driver assignment + pruned scan/score/collect + heap merge.
            q_mem = [(r["qid"], r["qvec"]) for r in one_q.collect()]
            timings[f"ann_ivf_1q_vec_{n}_docs"], spread = best_of(
                lambda: ivf_search_partitioned(
                    spark, f"{ivf_dir}/index", cents, one_q, k=1, nprobe=4,
                    precollected_centroids=pre_cents, merge="driver",
                    precollected_queries=q_mem,
                ).write.format("noop").mode("overwrite").save(),
                3,
            )
            query_meta[f"ann_ivf_1q_vec_{n}_docs"] = {
                "n_lists": 64, "nprobe": 4, "repeats": 3, "spread": spread,
                "since_round": 6,
                "index": "parquet partitionBy(cent_id), zstd",
                "centroids": "kmeans (r8; was first-64-rows)",
                "timed_region": "in-memory-query serving: driver "
                "assignment + pruned scan + score + driver heap merge "
                "(query vector pre-encoded in memory, like the "
                "reference's query loop; the ann_ivf_1q key keeps the "
                "query-collect-included region for round comparability)",
            }
            emit(timings, query_meta, sf, partial=True)

            # Index lifecycle under churn (r12 VERDICT #5): SCALE.md's
            # O(churn) upsert and O(live) retrain claims as measured
            # numbers, on the SAME 1M cent_id-partitioned corpus as the
            # serving keys above.  A batch-stamped copy of the index is
            # built ONCE outside every timed region (the ann_ivf_1q keys
            # keep their historical un-stamped layout for round
            # comparability).  NOTE (headline comparability): these three
            # keys are NEW in r13 and add their seconds to "value" —
            # compare r12/r13 totals per-key or via BENCH_NOTES.
            from semantic_vector_search_system_spark.operators.similarity import (  # noqa: E501
                ivf_retrain_index,
            )
            from semantic_vector_search_system_spark.sources.parquet_index import (  # noqa: E501
                upsert_vector_index,
            )

            life_dir = tempfile.mkdtemp(prefix="bench_idxlife_")
            life_idx = f"{life_dir}/index"
            write_vector_index(
                dvec.join(dl, "docid"), life_idx,
                partition_by="cent_id", batch=0,
            )
            # churn batch: the ~10k docs whose id ends in "42" get NEW
            # vectors (pure JVM transform — no python stage) — all
            # REPLACEMENTS, the path that pays the superseded scan +
            # tombstone append.  The timed region is the full production
            # upsert: assign new vectors to lists, append partition-
            # aligned, tombstone the superseded generations.  repeats=3
            # under AUTO batch ids — each repeat supersedes the previous
            # one's rows, so every run does the same 10k-row quantum of
            # work (tombstone table grows by O(churn) per run, which is
            # the steady state of a live index).
            churn = (
                dvec.filter(F.substring(F.col("docid"), -2, 2) == "42")
                .withColumn("vec", F.transform("vec", lambda c: -c))
                .cache()
            )
            n_churn = churn.count()  # materialized outside the timed region

            def _upsert_churn():
                from semantic_vector_search_system_spark.operators.similarity import (  # noqa: E501
                    ivf_assign_inline,
                )

                upsert_vector_index(
                    spark, life_idx, ivf_assign_inline(churn, cents, vec_col="vec"),
                    id_col="docid", batch=None, partition_by="cent_id",
                )

            timings[f"index_upsert_10k_churn_{n}_docs"], spread = best_of(
                _upsert_churn, 3
            )
            query_meta[f"index_upsert_10k_churn_{n}_docs"] = {
                "repeats": 3, "spread": spread, "since_round": 13,
                "churn_rows": n_churn,
                "timed_region": "assign-to-lists + partition-aligned "
                "append + superseded thin-scan + tombstone append "
                "(upsert_vector_index, auto batch id); all-replacement "
                "batch — the worst case (inserts skip the tombstone "
                "write).  r14: max-batch comes from the __meta.json "
                "sidecar and landed-count from the append's own "
                "Observation (two of r13's three thin O(live) scans "
                "gone); the superseded probe stays FULL here because "
                "cent_id churn is partition-UNSTABLE (negated vectors "
                "move lists — stable_partitions=False)",
            }
            emit(timings, query_meta, sf, partial=True)

            # masked serving after churn: the same 1-query pruned-scan
            # region as ann_ivf_1q_vec, plus the live=True tombstone
            # anti-join (broadcast, rides AFTER partition pruning) — the
            # measured cost of serving a MUTATED index without compaction.
            timings[f"index_serve_masked_1q_{n}_docs"], spread = best_of(
                lambda: ivf_search_partitioned(
                    spark, life_idx, cents, one_q, k=1, nprobe=4,
                    precollected_centroids=pre_cents, merge="driver",
                    precollected_queries=q_mem, live=True,
                ).write.format("noop").mode("overwrite").save(),
                3,
            )
            query_meta[f"index_serve_masked_1q_{n}_docs"] = {
                "n_lists": 64, "nprobe": 4, "repeats": 3, "spread": spread,
                "since_round": 13,
                "timed_region": "ann_ivf_1q_vec's in-memory-query serving "
                "region + live=True tombstone masking over the churned "
                "index (compare against ann_ivf_1q_vec for the mask's "
                "marginal cost)",
            }
            emit(timings, query_meta, sf, partial=True)

            # symlink-layout compaction (r13 VERDICT #7's comparison
            # anchor): fold the 3 churn batches' tombstones into a fresh
            # generation + atomic symlink swap.  repeats=1 — a compact IS
            # a full live-row rewrite (same policy as ivf_retrain).
            from semantic_vector_search_system_spark.sources.parquet_index import (  # noqa: E501
                compact_vector_index,
            )

            timings[f"index_compact_{n}_docs"], spread = best_of(
                lambda: compact_vector_index(
                    spark, life_idx, id_col="docid", partition_by="cent_id"
                ),
                1,
            )
            query_meta[f"index_compact_{n}_docs"] = {
                "repeats": 1, "spread": spread, "since_round": 14,
                "timed_region": "compact_vector_index: tombstone-masked "
                "live rewrite (partitionBy cent_id, zstd) + staging "
                "rename + atomic symlink swap + grace-GC — the shared-FS "
                "commit the manifest_compact key prices the CAS against",
            }
            emit(timings, query_meta, sf, partial=True)

            # manifest (object-store pointer) layout twins (r13 VERDICT
            # #7): the SAME corpus, churn and serve shapes through the
            # pointer-CAS layout — the per-key deltas vs the symlink keys
            # price pointer resolution (upsert/serve) and the conditional-
            # PUT commit (compact).  Index build is untimed (parity with
            # the symlink build above).
            from semantic_vector_search_system_spark.sources.manifest_index import (  # noqa: E501
                compact_manifest_index,
                current_gen_dir,
                upsert_manifest_index,
                write_manifest_index,
            )

            mani_dir = f"{life_dir}/mindex"
            write_manifest_index(
                dvec.join(dl, "docid").withColumn("_batch", F.lit(0)),
                mani_dir, partition_by="cent_id",
            )

            def _mani_upsert_churn():
                from semantic_vector_search_system_spark.operators.similarity import (  # noqa: E501
                    ivf_assign_inline,
                )

                upsert_manifest_index(
                    spark, mani_dir,
                    ivf_assign_inline(churn, cents, vec_col="vec"),
                    id_col="docid", batch=None, partition_by="cent_id",
                )

            timings[f"manifest_upsert_10k_churn_{n}_docs"], spread = best_of(
                _mani_upsert_churn, 3
            )
            query_meta[f"manifest_upsert_10k_churn_{n}_docs"] = {
                "repeats": 3, "spread": spread, "since_round": 14,
                "churn_rows": n_churn,
                "timed_region": "index_upsert_10k_churn's region through "
                "the pointer layout (resolve current gen + "
                "upsert_vector_index on its prefix); delta vs that key "
                "prices pointer resolution",
            }
            emit(timings, query_meta, sf, partial=True)

            timings[f"manifest_serve_masked_1q_{n}_docs"], spread = best_of(
                lambda: ivf_search_partitioned(
                    spark, current_gen_dir(mani_dir), cents, one_q, k=1,
                    nprobe=4, precollected_centroids=pre_cents,
                    merge="driver", precollected_queries=q_mem, live=True,
                ).write.format("noop").mode("overwrite").save(),
                3,
            )
            query_meta[f"manifest_serve_masked_1q_{n}_docs"] = {
                "n_lists": 64, "nprobe": 4, "repeats": 3, "spread": spread,
                "since_round": 14,
                "timed_region": "index_serve_masked_1q's region over the "
                "manifest layout's CURRENT generation (pointer resolve + "
                "pruned scan + tombstone mask)",
            }
            emit(timings, query_meta, sf, partial=True)

            timings[f"manifest_compact_{n}_docs"], spread = best_of(
                lambda: compact_manifest_index(
                    spark, mani_dir, id_col="docid", partition_by="cent_id"
                ),
                1,
            )
            query_meta[f"manifest_compact_{n}_docs"] = {
                "repeats": 1, "spread": spread, "since_round": 14,
                "timed_region": "compact_manifest_index: tombstone-masked "
                "live rewrite into gen-N+1 + conditional-PUT pointer CAS "
                "+ orphan GC; delta vs index_compact prices the manifest "
                "commit vs the symlink swap",
            }
            emit(timings, query_meta, sf, partial=True)
            shutil.rmtree(mani_dir, ignore_errors=True)

            # retrain-after-drift: full re-cluster (2% bounded sample) +
            # 1M-row re-assignment + partitioned rewrite + crash-safe
            # generation swap — the O(live) maintenance op ivf_drift_signal
            # gates.  repeats=2 (r13 VERDICT #1: the r13 record was
            # repeats=1 inside a co-tenant load spike and documented the
            # box, not the code — min-of-2 is the dedup_1000000_docs
            # precedent for write-heavy keys); input is the COMPACTED
            # index (tombstone-free), so the timed region is pure
            # train + assign + rewrite + swap.
            timings[f"ivf_retrain_{n}_docs"], spread = best_of(
                lambda: ivf_retrain_index(
                    spark, life_idx, 64, id_col="docid", vec_col="vec",
                    seed=7, max_iter=10, sample_fraction=0.02,
                ),
                2,
            )
            query_meta[f"ivf_retrain_{n}_docs"] = {
                "n_lists": 64, "repeats": 2, "spread": spread,
                "since_round": 13,
                "timed_region": "train_ivf_centroids (cached 2% sample) + "
                "ivf_assign_inline over the live 1M rows (scalar pandas "
                "UDF — vectors cross Arrow once, no join-back Exchange) + "
                "ONE repartition(n_lists, cent_id) + partitionBy(cent_id) "
                "rewrite + generation swap (r14: min-of-2; r13's 94.66s "
                "was repeats=1 under a 20-29 load spike)",
            }
            emit(timings, query_meta, sf, partial=True)
            churn.unpersist()
            shutil.rmtree(life_dir, ignore_errors=True)

            one_q.unpersist()
            shutil.rmtree(ivf_dir, ignore_errors=True)

            # ANN accuracy as a tracked number (r5 VERDICT #2): recall@10
            # of IVF vs the exact brute-force answer over THIS 1M index,
            # swept over nprobe — the curve a user tunes n_lists/nprobe by.
            # Not a timing: reported under "accuracy" (+ query_meta), never
            # summed into the headline seconds.
            from semantic_vector_search_system_spark.operators.similarity import (
                ivf_topk_fast,
            )

            k_rec, n_rec_q = 10, 20
            rq = qvec.limit(n_rec_q).cache()
            rq.count()
            dl = dl.cache()
            dl.count()  # assignment computed once for the 4-point sweep
            exact: dict = {}
            for r in topk_bruteforce(
                rq, dvec, k=k_rec, precollected=collect_query_matrix(rq)
            ).collect():
                exact.setdefault(r["qid"], set()).add(r["docid"])
            recall_by_nprobe = {}
            for nprobe in (1, 2, 4, 8):
                approx: dict = {}
                for r in ivf_topk_fast(
                    rq, dvec, cents, k=k_rec, nprobe=nprobe, doc_lists=dl
                ).collect():
                    approx.setdefault(r["qid"], set()).add(r["docid"])
                recs = [
                    len(exact[q] & approx.get(q, set())) / k_rec for q in exact
                ]
                recall_by_nprobe[f"nprobe={nprobe}"] = round(
                    sum(recs) / len(recs), 4
                )
            ACCURACY["ann_recall_1m"] = {
                "metric": f"mean recall@{k_rec} vs exact brute force",
                "n_queries": n_rec_q, "n_lists": 64, "k": k_rec,
                "centroids": "kmeans",
                **recall_by_nprobe,
            }
            query_meta["ann_recall_1m"] = {
                "since_round": 6, "reported_in": "accuracy",
                "floor_test": "tests/test_dedup_textanalysis.py::"
                "test_ivf_recall_floor_at_bench_geometry",
            }
            emit(timings, query_meta, sf, partial=True)

            # Filtered ANN recall (r9b): the predicate= path of the IVF
            # family, measured. label := trailing digit of the doc id
            # (ids are datagen strings "d0".."d999999" — a numeric mod
            # null-casts and silently empties the corpus, the r9b
            # first-run crash), deterministic selectivity ~0.1; exact
            # answer = brute force over ONLY the matching docs; the
            # nprobe sweep shows the scale-nprobe-with-1/selectivity
            # trade the operator docstring documents (a 0.1 filter thins
            # each probed list ~10x, so matching unfiltered recall needs
            # a wider probe). Reuses the cached corpus, queries and
            # doc-list assignment — adds ~3 IVF passes + one
            # 0.1-selectivity brute-force pass, not a new index build.
            def _filtered_recall() -> dict:
                from semantic_vector_search_system_spark.operators.similarity import (  # noqa: E501
                    effective_nprobe,
                )

                # predicates by trailing digit(s) of the string doc id:
                # deterministic selectivities 0.1 / 0.5 on the same corpus
                preds = {
                    0.1: F.substring(F.col("docid"), -1, 1) == "3",
                    0.5: F.substring(F.col("docid"), -1, 1).isin(
                        "0", "1", "2", "3", "4"
                    ),
                }

                def _recall(df, fexact):
                    fapprox: dict = {}
                    for r in df.collect():
                        fapprox.setdefault(r["qid"], set()).add(r["docid"])
                    recs = [
                        len(fexact[q] & fapprox.get(q, set())) / k_rec
                        for q in fexact
                    ]
                    return round(sum(recs) / len(recs), 4)

                fexact01: dict = {}
                for r in topk_bruteforce(
                    rq, dvec.filter(preds[0.1]), k=k_rec,
                    precollected=collect_query_matrix(rq),
                ).collect():
                    fexact01.setdefault(r["qid"], set()).add(r["docid"])
                if not fexact01:
                    raise RuntimeError(
                        "filtered-recall predicate matched no docs"
                    )
                out = {}
                # fixed ladder (since r9): the under-recall a fixed probe
                # count pays as the predicate tightens. selectivity=1.0
                # pins the FIXED behavior — since r11 a bare predicate
                # auto-estimates selectivity and widens the probe, which
                # is exactly what this ladder exists to contrast against.
                for nprobe in (4, 8, 16):
                    out[f"nprobe={nprobe}"] = _recall(
                        ivf_topk_fast(
                            rq, dvec, cents, k=k_rec, nprobe=nprobe,
                            doc_lists=dl, predicate=preds[0.1],
                            selectivity=1.0,
                        ),
                        fexact01,
                    )
                # selectivity x base-nprobe AUTO grid (r9 VERDICT #5):
                # effective_nprobe scales the probe by 1/selectivity
                # (capped at the 64-list fan-out); parity target = the
                # UNFILTERED recall at the same base nprobe (equal
                # scored-vector budget), taken from ann_recall_1m's sweep
                auto = {}
                for sel, fpred in preds.items():
                    fexact = fexact01
                    if sel != 0.1:
                        fexact = {}
                        for r in topk_bruteforce(
                            rq, dvec.filter(fpred), k=k_rec,
                            precollected=collect_query_matrix(rq),
                        ).collect():
                            fexact.setdefault(r["qid"], set()).add(r["docid"])
                    for base in (2, 4):
                        eff = effective_nprobe(base, sel, max_nprobe=64)
                        rec = _recall(
                            ivf_topk_fast(
                                rq, dvec, cents, k=k_rec, nprobe=base,
                                doc_lists=dl, predicate=fpred,
                                selectivity=sel, max_nprobe=64,
                            ),
                            fexact,
                        )
                        auto[f"sel={sel},base={base}"] = {
                            "eff_nprobe": eff,
                            "recall": rec,
                            "parity_target": recall_by_nprobe.get(
                                f"nprobe={base}"
                            ),
                        }
                out["auto"] = auto
                return out

            # an accuracy-only extra must never kill the official run
            # (the r9b first run aborted here and lost the round's final
            # folded line): failures are recorded and timing continues
            try:
                frecall = _filtered_recall()
                ACCURACY["ann_filtered_recall_1m"] = {
                    "metric": f"mean recall@{k_rec} vs exact brute force "
                    "over the filtered corpus (trailing-digit==3, sel 0.1)",
                    "n_queries": n_rec_q, "n_lists": 64, "k": k_rec,
                    "centroids": "kmeans",
                    **frecall,
                }
                query_meta["ann_filtered_recall_1m"] = {
                    "since_round": 9, "reported_in": "accuracy",
                    "semantics": "pre-filter (exact top-k of filtered "
                    "corpus within probed lists)",
                }
            except Exception as exc:  # noqa: BLE001 — record, don't abort
                query_meta["ann_filtered_recall_1m"] = {
                    "since_round": 9, "reported_in": "accuracy",
                    "error": f"{type(exc).__name__}: {exc}",
                }
            emit(timings, query_meta, sf, partial=True)

            # PQ: memory-compressed ANN over the same 1M corpus (r7).
            # 512-dim float32 vectors (2 KiB) -> m=8 codeword ids (8 B,
            # 256x); codebooks k-means-trained on a bounded 20k sample;
            # encode is one narrow Arrow stage (timed); serving is the
            # ADC LUT scan over the code table with per-partition
            # top-k + one k-rows-per-partition merge (timed). Recall@10
            # against the SAME exact sets as ann_recall_1m (vectors are
            # L2-normalized, so cosine and L2 rank identically).
            from semantic_vector_search_system_spark.operators.pq import (
                pq_adc_topk_fast,
                pq_encode_fast,
                pq_train_codebooks,
            )

            books = pq_train_codebooks(
                dvec, m=8, k_codes=256, vec_col="vec", sample_rows=20_000
            )
            codes_plan = pq_encode_fast(dvec, books, vec_col="vec", id_col="docid")
            timings[f"pq_encode_{n}_docs"], spread = best_of(
                lambda: codes_plan.write.format("noop").mode("overwrite").save(),
                2,
            )
            query_meta[f"pq_encode_{n}_docs"] = {
                "m": 8, "k_codes": 256, "repeats": 2, "spread": spread,
                "since_round": 7, "compression": "2KiB->8B per vector",
            }
            emit(timings, query_meta, sf, partial=True)
            codes_1m = codes_plan.localCheckpoint()  # the built PQ index
            q_rows = rq.collect()  # 20 in-memory query vectors (bounded)
            Qv = [r["qvec"] for r in q_rows]
            Qi = [r["qid"] for r in q_rows]
            pq_plan = pq_adc_topk_fast(
                Qv, Qi, codes_1m, books, k=k_rec, id_col="docid"
            )
            timings[f"ann_pq_20q_{n}_docs"], spread = best_of(
                lambda: pq_plan.write.format("noop").mode("overwrite").save(),
                3,
            )
            query_meta[f"ann_pq_20q_{n}_docs"] = {
                "m": 8, "k_codes": 256, "repeats": 3, "spread": spread,
                "since_round": 7,
                "timed_region": "ADC serving over the built code table: "
                "driver LUTs + code scan + per-partition top-k + merge",
            }
            pq_hits: dict = {}
            for r in pq_plan.collect():
                pq_hits.setdefault(r["qid"], set()).add(r["docid"])
            pq_recs = [
                len(exact[q] & pq_hits.get(q, set())) / k_rec for q in exact
            ]
            ACCURACY["ann_pq_1m"] = {
                "metric": f"mean recall@{k_rec} vs exact brute force",
                "n_queries": n_rec_q, "m": 8, "k_codes": 256,
                "recall": round(sum(pq_recs) / len(pq_recs), 4),
            }
            query_meta["ann_pq_1m"] = {
                "since_round": 7, "reported_in": "accuracy",
                "floor_test": "tests/test_pq.py::test_pq_recall_floor_vs_exact",
            }
            emit(timings, query_meta, sf, partial=True)

            # IVF+PQ (r7): the standard billion-scale serving composition
            # (IVFADC) — residual codebooks, codes partitioned by list,
            # per-query serving = driver probe assignment + partition-
            # pruned scan of ~nprobe/n_lists of the 256x-compressed code
            # table + per-(query,list) LUT scoring + bounded merge.
            import numpy as _np

            from semantic_vector_search_system_spark.operators.pq import (
                ivfpq_encode,
                ivfpq_topk,
                ivfpq_train,
            )

            C_np = _np.asarray(
                [r["cvec"] for r in pre_cents], dtype=_np.float64
            )
            cid_np = _np.arange(len(pre_cents))
            books_r = ivfpq_train(
                dvec, cid_np, C_np, m=8, k_codes=256, vec_col="vec"
            )
            ivfpq_dir = tempfile.mkdtemp(prefix="bench_ivfpq_")
            ivfpq_encode(
                dvec, cid_np, C_np, books_r, vec_col="vec", id_col="docid"
            ).write.partitionBy("cent_id").parquet(f"{ivfpq_dir}/codes")
            coded = spark.read.parquet(f"{ivfpq_dir}/codes")
            timings[f"ann_ivfpq_1q_{n}_docs"], spread = best_of(
                lambda: ivfpq_topk(
                    Qv[:1], Qi[:1], coded, cid_np, C_np, books_r,
                    k=1, nprobe=4, id_col="docid",
                ).write.format("noop").mode("overwrite").save(),
                3,
            )
            query_meta[f"ann_ivfpq_1q_{n}_docs"] = {
                "n_lists": 64, "nprobe": 4, "m": 8, "k_codes": 256,
                "repeats": 3, "spread": spread, "since_round": 7,
                "index": "codes parquet partitionBy(cent_id)",
                "timed_region": "in-memory-query serving: driver probe "
                "assignment + LUT build + pruned code scan + per-list "
                "ADC + merge",
            }
            ivfpq_hits: dict = {}
            for r in ivfpq_topk(
                Qv, Qi, coded, cid_np, C_np, books_r,
                k=k_rec, nprobe=4, id_col="docid",
            ).collect():
                ivfpq_hits.setdefault(r["qid"], set()).add(r["docid"])
            iv_recs = [
                len(exact[q] & ivfpq_hits.get(q, set())) / k_rec
                for q in exact
            ]
            ACCURACY["ann_ivfpq_1m"] = {
                "metric": f"mean recall@{k_rec} vs exact brute force",
                "n_queries": n_rec_q, "n_lists": 64, "nprobe": 4,
                "m": 8, "k_codes": 256, "centroids": "kmeans",
                "recall": round(sum(iv_recs) / len(iv_recs), 4),
            }
            query_meta["ann_ivfpq_1m"] = {
                "since_round": 7, "reported_in": "accuracy",
                "floor_test": "tests/test_pq.py::"
                "test_ivfpq_recall_monotone_and_floor",
            }
            emit(timings, query_meta, sf, partial=True)
            shutil.rmtree(ivfpq_dir, ignore_errors=True)

            # SemDeDup at 1M (r7b): clustered semantic dedup over the same
            # 512-dim corpus — k=1024 arbitrary-row centroids (k ~ sqrt(n)
            # balances assignment n*k*d against per-cluster pruning
            # n*(n/k)*d, ~1e12 BLAS flops total). Timed region is the whole
            # pipeline: fused narrow assignment (vector carried through, no
            # rejoin) -> ONE cent_id shuffle -> tiled triangular-max prune.
            from semantic_vector_search_system_spark.operators.similarity import (
                semdedup,
            )

            sd_cents = dvec.filter(
                F.substring("docid", 2, 18).cast("long") < 1024
            ).select(F.col("docid").alias("cent_id"), F.col("vec").alias("cvec"))
            # r14: assign="inline" (scalar-UDF struct on the carried row)
            # replaces "fast_join" — parity-tested row-identical
            # (tests/test_dedup_textanalysis.py::
            # test_semdedup_inline_strategy_parity_and_single_exchange);
            # interleaved 1M A/B under load: fast_join {113, 81, 31} s vs
            # inline {37, 17, 17} s — the vec column no longer re-encodes
            # out of Python (fast's tax) NOR shuffles twice through the
            # id rejoin (fast_join's tax); ONE Exchange total.
            sd_plan = semdedup(
                dvec, sd_cents, threshold=0.99, keep="far",
                id_col="docid", vec_col="vec", assign="inline",
                score_dtype="float32",
            )
            timings[f"semdedup_{n}_docs"], spread = best_of(
                lambda: sd_plan.write.format("noop").mode("overwrite").save(),
                2,
            )
            query_meta[f"semdedup_{n}_docs"] = {
                "n_clusters": 1024, "threshold": 0.99, "keep": "far",
                "score_dtype": "float32", "assign": "inline",
                "repeats": 2, "spread": spread, "since_round": 7,
                "timed_region": "scalar-UDF struct assign on the carried "
                "row (one Arrow crossing IN, thin struct back) -> ONE "
                "cent_id shuffle -> per-cluster tiled triangular-max "
                "prune (r14; was fast_join: skinny assign + JVM vec join)",
            }
            emit(timings, query_meta, sf, partial=True)
            rq.unpersist()
            dl.unpersist()
        dvec.unpersist()
        docs.unpersist()

    if bench_1m:
        # North-star dedup pipeline at the reference's largest published
        # size: minhash -> LSH bucket star-edges -> connected components ->
        # keep-one, over 1M docs with a deliberately skewed duplicate
        # population: one 8,192-copy boilerplate cluster (the hot LSH
        # bucket) + 10,000 spread pair-duplicates. Star edges keep the hot
        # bucket O(b) instead of O(b^2) pairs — the 100 TB shape.
        from semantic_vector_search_system_spark.operators.dedup import (
            lsh_bucket_edges_from_bands,
            minhash_band_signatures_vectorized,
            neardup_clusters,
            verify_candidate_edges,
        )

        n = 1_000_000
        idnum = F.substring("id", 2, 18).cast("long")
        hot = "terms of service boilerplate text repeated verbatim across the scraped mirror sites"
        # every token carries the pair-group id, so every 3-shingle is
        # group-unique: cross-group Jaccard is exactly 0 (a shared template
        # with only the number differing would leave cross-group J ~ 0.7 and
        # merge all 10k pairs into one giant component)
        gid = (idnum / 2).cast("long").cast("string")
        pair_words = "duplicated article body shared by syndication partner".split()
        pair_text = F.concat_ws(
            " ", *[F.concat(F.lit(w + "_"), gid) for w in pair_words]
        )
        docs = (
            generate_documents(spark, n, seed=42, num_partitions=32)
            .withColumn(
                "text",
                F.when(idnum < 8192, F.lit(hot))
                .when((idnum >= 100_000) & (idnum < 120_000), pair_text)
                .otherwise(F.col("text")),
            )
            .cache()
        )
        docs.count()  # materialize the corpus outside the timed region
        # "fast" family: vectorized token-hash kernel (no per-shingle
        # Python) — the throughput family for corpora that are the product;
        # the md5 family remains the oracle-replayable default.
        # LSH tuning for 1M docs: 16 hashes in 4 bands of 4 -> collision
        # threshold (1/4)^(1/4) ~ 0.71. Bands of 2 (threshold 0.5) admit
        # random-pair collisions at P ~ J^2: with background J ~ 1.5e-3
        # (33-word generator vocab) and C(1M,2) pairs that is millions of
        # spurious edges chaining the corpus into giant components; bands
        # of 4 push it to J^4, leaving only a few hundred spurious edges
        # corpus-wide (measured ~500 at 1M) — which the exact-Jaccard
        # verify stage then kills, so the drop list is exactly the planted
        # duplicates. candidates -> verify -> cluster is the production
        # dedup shape; verification prices at O(edges · doc_len).
        def run_dedup_1m() -> float:
            t0 = time.time()
            # r5: the fused fast-family kernel — minhash minima AND band
            # digests in one narrow Arrow stage (collision-parity-tested
            # vs the two-step form), skipping both the 16-rows-per-doc
            # long format and the groupBy(id, band) shuffle that together
            # dominated the pipeline's first stage
            bands = minhash_band_signatures_vectorized(
                docs, id_col="id", text_col="text",
                num_hashes=16, rows_per_band=4,
            )
            # the edge list is tiny (O(dups)) but its lineage is the whole
            # minhash+banding DAG, and downstream consumes it three times
            # (verify reads it twice, clustering once): checkpoint it so the
            # signature pass runs exactly once
            edges = lsh_bucket_edges_from_bands(bands, id_col="id").localCheckpoint()
            clusters = neardup_clusters(
                verify_candidate_edges(docs, edges, id_col="id", threshold=0.7)
            )
            # the keep-one drop list is the pipeline's product
            clusters.filter(~F.col("is_canonical")).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0

        # min of 2 timed runs (was single-run): each run rebuilds its own
        # checkpoints and edge probe — no state is shared across runs beyond
        # the pre-materialized docs cache and JIT warmth (verified: repeated
        # runs measure a steady 10-15 s, not an ever-shrinking number) —
        # while a lone cold run of this long DAG measured up to 56 s under
        # codegen + co-tenant variance.
        d1, d2 = run_dedup_1m(), run_dedup_1m()
        timings["dedup_1000000_docs"] = round(min(d1, d2), 3)
        query_meta["dedup_1000000_docs"] = {
            "repeats": 2, "spread": round(abs(d1 - d2), 3),
        }
        emit(timings, query_meta, sf, partial=True)

        # Sub-document span dedup over the SAME skewed 1M corpus (r7):
        # the 8,192-copy boilerplate is chunk-identical, so its spans
        # collapse to one surviving occurrence — the hash-keyed
        # keep-first window + doc-keyed reassembly, end to end.
        from semantic_vector_search_system_spark.operators.lexical import (
            span_dedup as _span_dedup,
        )

        # r15: chunker="arrow" (one mapInPandas pass, per-distinct-chunk
        # memoized digests) replaces the expr chunk construction —
        # BITWISE-identical rows (tests/test_lexical.py::
        # test_span_dedup_arrow_chunker_bitwise_parity; the catalog
        # oracle row runs the same face); interleaved 1M A/B:
        # expr {11.79, 11.74, 11.21} vs arrow {6.69, 6.93, 23.21*}
        # (* = co-tenant spike).
        timings["span_dedup_1000000_docs"], spread = best_of(
            lambda: _span_dedup(docs, span_tokens=20, doc_id="id", chunker="arrow")
            .write.format("noop")
            .mode("overwrite")
            .save(),
            2,
        )
        query_meta["span_dedup_1000000_docs"] = {
            "repeats": 2, "spread": spread, "since_round": 7,
            "chunker": "arrow (r15; expr face through r14 — "
            "bitwise-parity-tested)",
        }
        emit(timings, query_meta, sf, partial=True)

        # Model-based quality filtering over the same 1M docs (r7): the
        # linear-classifier margin as a pure narrow DECIMAL fold —
        # measures the expression engine's per-token throughput (~40M
        # hashed-feature weights), no explode/shuffle/Python.
        from semantic_vector_search_system_spark.operators.quality_filters import (
            linear_quality_margin,
        )

        # r14: strategy="fast" (Arrow kernel, per-distinct-token memoized
        # digests) replaces the expr DECIMAL fold — BITWISE-identical
        # output (tests/test_quality_filters.py::
        # test_linear_quality_margin_fast_face_bitwise_parity); the expr
        # face pays one md5 expression per token INSTANCE (~111M here).
        timings["quality_classifier_1000000_docs"], spread = best_of(
            lambda: linear_quality_margin(docs, id_col="id", strategy="fast")
            .write.format("noop")
            .mode("overwrite")
            .save(),
            2,
        )
        query_meta["quality_classifier_1000000_docs"] = {
            "repeats": 2, "spread": spread, "since_round": 7,
            "strategy": "fast (r14; expr face through r13 — "
            "bitwise-parity-tested)",
        }
        emit(timings, query_meta, sf, partial=True)

        # Incremental dedup serving: a 100k NEW batch against the 1M
        # corpus' STORED signature index — the daily-crawl shape. Since r6
        # the index is real STORAGE (r5 VERDICT #7): bucketed parquet
        # warehouse tables written once by write_neardup_index (signature
        # rows bucketed by id for the agreement join, band digests bucketed
        # by band_sig for the candidate join, metadata table declaring the
        # hash family) — the timed region reads the index from disk like a
        # serving process would: new-batch fused minhash+banding, band
        # equi-join probe of the scanned index, per-edge agreement, per-doc
        # argmax. ~72% of the batch are true dups (regenerated corpus
        # texts), the rest novel — a realistic recrawl mix.
        from semantic_vector_search_system_spark.operators.dedup import (
            incremental_neardup,
            read_neardup_index,
            write_neardup_index,
        )

        write_neardup_index(
            docs, "bench_nd_idx", id_col="id", text_col="text",
            num_hashes=16, rows_per_band=4, hash_family="fast", n_buckets=32,
        )
        corpus_sigs, corpus_bands, idx_meta = read_neardup_index(
            spark, "bench_nd_idx"
        )
        new_batch = generate_documents(
            spark, 100_000, seed=42, num_partitions=32
        ).cache()
        new_batch.count()
        timings["incremental_dedup_100k_vs_1m"], spread = best_of(
            lambda: incremental_neardup(
                new_batch, corpus_sigs, id_col="id", text_col="text",
                num_hashes=16, rows_per_band=4, threshold=0.7,
                hash_family="fast", corpus_bands=corpus_bands,
                corpus_hash_family=idx_meta["hash_family"],
            ).write.format("noop").mode("overwrite").save(),
            2,
        )
        query_meta["incremental_dedup_100k_vs_1m"] = {
            "repeats": 2, "spread": spread, "since_round": 5,
            "index": "bucketed parquet warehouse tables (r6: read from "
            "storage; write_neardup_index/read_neardup_index)",
        }
        emit(timings, query_meta, sf, partial=True)

        # Forget -> reprobe (r9 VERDICT #8): serving latency with a LIVE
        # tombstone mask — the right-to-be-forgotten steady state between
        # a delete batch and the next compaction. 1,000 corpus ids are
        # tombstoned (untimed O(delete-batch) append), then the SAME 100k
        # recrawl batch probes the index with the broadcast anti-join
        # mask active on both stored relations. The delta vs
        # incremental_dedup_100k_vs_1m IS the measured cost of serving
        # after deletes without compaction.
        from semantic_vector_search_system_spark.operators.dedup import (
            tombstone_neardup_index,
        )

        tombstone_neardup_index(
            spark, "bench_nd_idx",
            docs.select("id").limit(1_000),
        )
        m_sigs, m_bands, m_meta = read_neardup_index(spark, "bench_nd_idx")
        timings["incremental_dedup_tombstoned_100k_vs_1m"], spread = best_of(
            lambda: incremental_neardup(
                new_batch, m_sigs, id_col="id", text_col="text",
                num_hashes=16, rows_per_band=4, threshold=0.7,
                hash_family="fast", corpus_bands=m_bands,
                corpus_hash_family=m_meta["hash_family"],
            ).write.format("noop").mode("overwrite").save(),
            2,
        )
        query_meta["incremental_dedup_tombstoned_100k_vs_1m"] = {
            "repeats": 2, "spread": spread, "since_round": 10,
            "tombstoned_ids": 1_000,
            "timed_region": "stored-index serving with the tombstone "
            "broadcast anti-join mask live on sigs+bands (deletes not "
            "yet compacted); baseline = incremental_dedup_100k_vs_1m",
        }
        for t in ("_sigs", "_bands", "_meta", "_tombstones"):
            spark.sql(f"DROP TABLE IF EXISTS bench_nd_idx{t}")
        emit(timings, query_meta, sf, partial=True)

        # Incremental curation funnel (r9): the SAME 100k recrawl batch
        # through the stored four-gate funnel — length gate -> classifier
        # margin -> bigram-LM >= stored threshold -> hash-dedup against
        # the stored accepted-hash table. The LM + threshold are fit on a
        # bounded 200k REFERENCE SNAPSHOT (r9b; production fits its
        # fluency LM on a curated reference — CCNet uses Wikipedia — not
        # on the crawl itself, and the 1M fit was 12 min of untimed wall
        # per bench run), the hash state is then seeded with the full 1M
        # corpus's accepts, like a crawl loop holds it; each timed run
        # reads state from storage, flows the batch through all four
        # gates and materializes the accepts (the index append is
        # excluded: repeating it would make run 2 dedup against run 1's
        # output).
        from semantic_vector_search_system_spark.operators.curation import (
            incremental_curation_funnel_stored,
            write_funnel_state,
        )

        for t in ("_cnt2", "_cnt1", "_meta", "_hashes"):
            spark.sql(f"DROP TABLE IF EXISTS bench_cur_state{t}")
        ref_snap = generate_documents(
            spark, 200_000, seed=42, num_partitions=32
        )
        write_funnel_state(ref_snap, "bench_cur_state", doc_id="id")
        # seed the hash state with the corpus's own accepts (one pass,
        # outside the timed region): the timed batch then dedups against
        # a REAL populated index, the daily-crawl shape
        incremental_curation_funnel_stored(
            docs, "bench_cur_state", update_index=True, doc_id="id"
        ).count()
        timings["curation_funnel_100k_vs_1m"], spread = best_of(
            lambda: incremental_curation_funnel_stored(
                new_batch, "bench_cur_state", update_index=False,
                doc_id="id",
            ).write.format("noop").mode("overwrite").save(),
            2,
        )
        query_meta["curation_funnel_100k_vs_1m"] = {
            "repeats": 2, "spread": spread, "since_round": 9,
            "fit": "LM+threshold on a 200k reference snapshot (r9b); "
            "hash state seeded with the 1M corpus accepts",
            "timed_region": "stored-state serving: read gate state from "
            "warehouse tables + 4 gates + in-batch keep-first + "
            "anti-join vs stored hashes (state fit/write excluded, like "
            "the stored-index dedup keys)",
        }
        emit(timings, query_meta, sf, partial=True)
        for t in ("_cnt2", "_cnt1", "_meta", "_hashes"):
            spark.sql(f"DROP TABLE IF EXISTS bench_cur_state{t}")
        new_batch.unpersist()

        # Reproducible epoch shuffle over the same 1M docs (r8b): the
        # distributed global-rank primitive (range-repartitioned parallel
        # sort + O(partitions) offsets — NO single-partition window)
        # under its training-data consumer: seeded shard + exact
        # in-shard position for every doc.
        from semantic_vector_search_system_spark.operators.corpus import (
            deterministic_shuffle,
        )

        timings["epoch_shuffle_1000000_docs"], spread = best_of(
            lambda: deterministic_shuffle(
                docs.select("id"), n_shards=8, seed="bench", id_col="id"
            ).write.format("noop").mode("overwrite").save(),
            2,
        )
        query_meta["epoch_shuffle_1000000_docs"] = {
            "repeats": 2, "spread": spread, "since_round": 8,
        }
        emit(timings, query_meta, sf, partial=True)

        # DSIR selection over the same 1M docs (r8c): hashed-ngram
        # importance ratios (111M token instances -> ~220M grams), the
        # Arrow-kernel face with memoized digests and driver-exact
        # integer ratios (bitwise-parity-tested vs the oracle's
        # expression face, which measured >9 min on this corpus —
        # per-gram md5 expressions + a 10^8-row DECIMAL aggregation).
        from semantic_vector_search_system_spark.operators.dsir import dsir_topk

        _idn = F.substring("id", 2, 18).cast("long")
        timings["dsir_select_1000000_docs"], spread = best_of(
            lambda: dsir_topk(
                docs.filter(_idn % 97 != 0), docs.filter(_idn % 97 == 0),
                k=1000, n_buckets=4096, doc_id="id", strategy="fast",
            ).write.format("noop").mode("overwrite").save(),
            2,
        )
        query_meta["dsir_select_1000000_docs"] = {
            "repeats": 2, "spread": spread, "since_round": 8,
            "strategy": "fast (expr face >9min at this scale; "
            "bitwise-parity-tested)",
        }
        emit(timings, query_meta, sf, partial=True)

        # Deterministic Lloyd k-means in its documented at-scale shape
        # (r8c): fit k=64 on a 200k sample (2 iterations, DECIMAL-exact
        # updates), then one distributed full-corpus assignment of the
        # 1M x 64 vectors through the bitwise-parity Arrow kernel. The
        # full-corpus-fit variant prices at ~16.5 s/iteration (the
        # oracle-exact 64M-row DECIMAL update); the sample-fit shape is
        # what the operator docstring prescribes at 100 TB.
        from semantic_vector_search_system_spark.operators.clustering import (
            _assign_fast,
            _lloyd,
        )

        enc64 = HashingEncoderFast(dim=64)
        kvec = enc64.encode(docs).select(
            _idn.alias("vec_id"), F.col("vec").cast("array<double>").alias("v")
        ).localCheckpoint()

        def run_kmeans_1m() -> float:
            t0 = time.time()
            sample = kvec.filter(F.col("vec_id") % 5 == 0).localCheckpoint()
            _, cents = _lloyd(sample, 64, 2, "fast", 6)
            _assign_fast(kvec, cents).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0

        k1, k2 = run_kmeans_1m(), run_kmeans_1m()
        timings["kmeans_fit200k_assign_1000000_docs"] = round(min(k1, k2), 3)
        query_meta["kmeans_fit200k_assign_1000000_docs"] = {
            "repeats": 2, "spread": round(abs(k1 - k2), 3),
            "since_round": 8, "k": 64, "iters": 2, "dim": 64,
            "shape": "sample-fit + distributed full assign",
        }
        emit(timings, query_meta, sf, partial=True)
        docs.unpersist()

    # End-of-run floors (r13 VERDICT #8): re-probe both floors AFTER the
    # last key so a mid-run load spike shows in the record of the run it
    # corrupts (the start-only floors were quiet for the r13 run whose
    # retrain key a later spike hit).
    probe_floors("_end")

    # Stop FIRST, then print the authoritative final line (r4 lesson,
    # VERDICT item 1): shutdown is when worker/daemon teardown noise hits
    # stderr, and the driver keeps only a finite output tail — printing
    # before stop() let the noise bury the metric line (BENCH_r04
    # parsed:null).  The daemon-side EPIPE spam itself is also fixed at the
    # source (worker_daemon.py quiet-shutdown wrapper), so this ordering is
    # a second line of defense, not the fix.
    spark.stop()
    emit(timings, query_meta, sf, partial=False)


if __name__ == "__main__":
    main()
