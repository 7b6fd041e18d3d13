"""Adaptive recrawl scheduling — the crawl-LOOP stage after
``snapshot_diff``: given the change history of each URL across crawl
snapshots, estimate how often it changes and rank what to fetch next.

No counterpart in the reference (its sources are static JSONL); this
closes the crawl cycle this engine already models relationally:

    fetch (WARC) -> politeness (robots) -> url_dedup -> snapshot_diff
        -> **recrawl_priority** -> the next fetch frontier

Semantics (the Cho & Garcia-Molina 2003 adaptive-recrawl shape, made
transcendental-free per the house oracle rules):

* per URL, over its observed snapshots: ``n_checks`` = snapshots where
  the URL was visited, ``n_changes`` = diffs where it was ``added`` or
  ``changed`` (an 'added' IS a change event: the first fetch observed
  new content), ``age`` = intervals since the URL was last VISITED,
  counted to one interval PAST the newest snapshot anywhere in the
  history (so a URL checked in the newest diff has age 1 — the upcoming
  inter-crawl interval — and URLs skipped by partial recrawls age up);
* ``change_rate`` = (n_changes + 1) / (n_checks + 2) — the Laplace
  estimator of the per-snapshot change probability (never 0 or 1, so
  cold URLs still get scheduled and hot URLs never saturate);
* ``priority`` = change_rate · age — the expected number of changes
  MISSED by the next crawl if the URL is skipped again (the
  staleness-weighted frequency rule); ``removed`` URLs drop out of the
  frontier entirely (re-discovery re-enters them as ``added``).

Determinism: change_rate and priority are rationals of small integers —
exactly the class where cross-engine ROUND diverges at .5 boundaries
(r10 VERDICT #2) — so both are pinned with the FLOOR quantizer
(functions/quantize.py) at 12 dp, and the ranking tie-breaks on
canonical_url.

Scale shape: ONE hash shuffle keyed by canonical_url (the groupBy;
map-side partial counts collapse each URL's history inside the scan
partitions first), then a bounded global top-k via TakeOrderedAndProject
when ``frontier_size`` is set — no window over the full URL universe,
no driver collect. At 100 TB the history relation is
(urls x snapshots) rows but the output is one row per LIVE url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.quantize import quantize

#: diff statuses that count as a change event for the rate estimate
_CHANGE_STATUSES = ("added", "changed")


def recrawl_priority(
    history: DataFrame,
    url_col: str = "canonical_url",
    snapshot_col: str = "snapshot_id",
    status_col: str = "status",
    frontier_size: int | None = None,
    now_snapshot: int | None = None,
) -> DataFrame:
    """Rank URLs for the next crawl from their ``snapshot_diff`` history.

    ``history`` has one row per (url, snapshot) observation with the
    diff ``status`` of that snapshot (``added``/``changed``/``unchanged``/
    ``removed``) and an integer-orderable ``snapshot_id`` (newest =
    largest).  Returns one row per URL still in the frontier::

        (canonical_url, n_checks, n_changes, last_change_snapshot,
         change_rate, priority)

    sorted by nothing (callers rank); with ``frontier_size`` the result
    is the global top-k by (priority desc, url asc) — a
    TakeOrderedAndProject, never a full-universe window sort.

    URLs whose LATEST observation is ``removed`` leave the frontier:
    their page is gone; re-discovery re-enters them as ``added``.

    ``now_snapshot`` anchors the staleness clock; None derives it as the
    max snapshot in the history (one broadcast 1-row aggregate — the
    scheduler usually knows its own crawl counter and passes it).
    """
    st = F.col(status_col)
    is_change = st.isin(*_CHANGE_STATUSES).cast("int")
    latest = F.max(
        F.struct(F.col(snapshot_col).alias("_s"), st.alias("_st"))
    )
    agg = history.groupBy(F.col(url_col).alias("canonical_url")).agg(
        F.count("*").alias("n_checks"),
        F.sum(is_change).alias("n_changes"),
        F.max(F.when(is_change == 1, F.col(snapshot_col))).alias(
            "last_change_snapshot"
        ),
        F.max(F.col(snapshot_col)).alias("_last_seen"),
        latest.alias("_latest"),
    )
    if now_snapshot is not None:
        agg = agg.withColumn("_now", F.lit(int(now_snapshot)))
    else:
        now = history.agg(F.max(F.col(snapshot_col)).alias("_now"))
        agg = agg.crossJoin(F.broadcast(now))
    live = agg.filter(F.col("_latest._st") != "removed")
    # intervals since the last VISIT, including the upcoming one: a URL
    # checked in the newest snapshot has age 1; URLs skipped by partial
    # recrawls age up and their expected missed changes accumulate
    age = (F.col("_now") - F.col("_last_seen") + F.lit(1)).cast("double")
    rate = quantize(
        (F.col("n_changes") + F.lit(1)).cast("double")
        / (F.col("n_checks") + F.lit(2)).cast("double"),
        12,
    )
    out = live.select(
        "canonical_url",
        "n_checks",
        "n_changes",
        "last_change_snapshot",
        rate.alias("change_rate"),
        quantize(rate * age, 12).alias("priority"),
    )
    if frontier_size is not None:
        out = out.orderBy(
            F.desc("priority"), F.asc("canonical_url")
        ).limit(int(frontier_size))
    return out


def diff_to_history(
    diff: DataFrame, snapshot_id: int, url_col: str = "canonical_url"
) -> DataFrame:
    """Tag one ``snapshot_diff`` output as a history slice:
    ``(url, snapshot_id, status)`` — union successive slices to build
    the :func:`recrawl_priority` input incrementally (append-only; at
    scale this is the partitioned crawl-log table)."""
    return diff.select(
        F.col(url_col).alias("canonical_url"),
        F.lit(int(snapshot_id)).alias("snapshot_id"),
        F.col("status"),
    )
