"""robots.txt parsing + politeness filtering (operators/robots.py, r10):
the stateful line-group grammar expressed relationally, and RFC-9309
longest-match Allow/Disallow decisions."""

from __future__ import annotations

from pyspark.sql import functions as F

from semantic_vector_search_system_spark.operators.robots import (
    apply_robots,
    parse_robots,
    url_host,
    url_path,
)

ROBOTS = (
    "# crawl policy\n"
    "User-agent: googlebot\n"
    "Disallow: /\n"
    "\n"
    "User-agent: superbot\n"
    "User-agent: *\n"
    "Disallow: /private/\n"
    "Allow: /private/ok\n"
    "# tmp is scratch\n"
    "Disallow: /tmp\n"
)


def test_parse_robots_groups_comments_agents(spark):
    df = spark.createDataFrame(
        [("a.example", ROBOTS), ("empty.example", "User-agent: *\nDisallow:\n")],
        "host string, robots_txt string",
    )
    rules = {
        (r["host"], r["rule"], r["prefix"])
        for r in parse_robots(df).collect()
    }
    # the googlebot group is NOT ours; the header-RUN (superbot + *) is
    assert rules == {
        ("a.example", "disallow", "/private/"),
        ("a.example", "allow", "/private/ok"),
        ("a.example", "disallow", "/tmp"),
        # empty Disallow == allow-everything
        ("empty.example", "allow", ""),
    }
    # RFC 9309 group selection (r12): a named-token match makes the
    # crawler obey ONLY that group — the '*' group is not consulted
    g = {
        (r["host"], r["rule"], r["prefix"])
        for r in parse_robots(df, user_agent="googlebot").collect()
        if r["host"] == "a.example"
    }
    assert g == {("a.example", "disallow", "/")}


def test_parse_robots_agent_ladder_most_specific_wins(spark):
    """r12: multi-token crawlers pass their product-token ladder (most
    specific first) — the best-matching level's groups apply, same-level
    groups merge, '*' only as the fallback."""
    txt = (
        "User-agent: mybot-images\nDisallow: /img-private/\n\n"
        "User-agent: mybot\nDisallow: /bot-private/\n\n"
        "User-agent: mybot\nAllow: /bot-private/ok\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    df = spark.createDataFrame(
        [("a.example", txt), ("star-only.example", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string",
    )
    # full ladder: the images token is most specific -> only its group
    g = {
        (r["rule"], r["prefix"])
        for r in parse_robots(
            df, user_agent=["mybot-images", "mybot"]
        ).collect()
        if r["host"] == "a.example"
    }
    assert g == {("disallow", "/img-private/")}
    # generic token only: BOTH mybot groups merge (same level), the
    # images group and '*' do not apply
    g2 = {
        (r["rule"], r["prefix"])
        for r in parse_robots(df, user_agent=["mybot"]).collect()
        if r["host"] == "a.example"
    }
    assert g2 == {("disallow", "/bot-private/"), ("allow", "/bot-private/ok")}
    # a host with only '*' groups falls back to them for any ladder
    g3 = {
        (r["host"], r["rule"], r["prefix"])
        for r in parse_robots(
            df, user_agent=["mybot-images", "mybot"]
        ).collect()
        if r["host"] == "star-only.example"
    }
    assert g3 == {("star-only.example", "disallow", "/x")}
    # unknown token everywhere -> '*' fallback on a.example too
    g4 = {
        (r["rule"], r["prefix"])
        for r in parse_robots(df, user_agent="strangerbot").collect()
        if r["host"] == "a.example"
    }
    assert g4 == {("disallow", "/")}


def test_apply_robots_longest_match_and_defaults(spark):
    rules = spark.createDataFrame(
        [
            ("a.example", "disallow", "/private/"),
            ("a.example", "allow", "/private/ok"),
            ("a.example", "disallow", "/tmp"),
            ("all.example", "disallow", "/"),
            # equal-length tie: allow wins
            ("tie.example", "disallow", "/x/"),
            ("tie.example", "allow", "/x/"),
        ],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [
            (1, "http://a.example/a/page"),
            (2, "http://a.example/private/doc"),
            (3, "http://a.example/private/ok/doc"),
            (4, "http://a.example/tmp/x"),
            (5, "http://a.example"),            # bare host -> path '/'
            (6, "http://all.example/anything"),
            (7, "http://norules.example/x"),    # no rules -> allowed
            (8, "http://tie.example/x/y"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["robots_allowed"]
        for r in apply_robots(pages, rules).collect()
    }
    assert got == {
        1: True, 2: False, 3: True, 4: False,
        5: True, 6: False, 7: True, 8: True,
    }


def test_url_host_path_helpers(spark):
    df = spark.createDataFrame(
        [("HTTPS://WWW.Site.Example:443/A/b?q=1#f",), ("http://h.example",)],
        "url string",
    )
    rows = df.select(
        url_host("url").alias("h"), url_path("url").alias("p")
    ).collect()
    assert (rows[0]["h"], rows[0]["p"]) == ("www.site.example", "/A/b")
    assert (rows[1]["h"], rows[1]["p"]) == ("h.example", "/")


def test_apply_robots_plan_broadcasts_rules(spark):
    """Scale gate (r10 VERDICT #3/#4): the policy relation must BROADCAST
    (it is bounded by crawl-policy size) and the page side must be
    MAP-ONLY — zero Exchange anywhere except the single rules-side
    per-host pre-aggregation. A 100 TB crawl must stream the page
    relation exactly once; the pre-r11 plan shuffled it ~3 times
    (groupBy(_rid) + a page×page self-join)."""
    rules = spark.createDataFrame(
        [("a.example", "disallow", "/private/")],
        "host string, rule string, prefix string",
    )
    pages = spark.createDataFrame(
        [(1, "http://a.example/x")], "doc_id long, url string"
    )
    plan = (
        apply_robots(pages, rules)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    # page side never re-partitions: no sort-merge join, no page-keyed
    # aggregation. The ONLY shuffle Exchange is the rules-side groupBy
    # (hashpartitioning on the rules' host key).
    assert "SortMergeJoin" not in plan
    import re

    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert len(exchanges) <= 1, plan
    if exchanges:
        # keyed by the RULES' host column (pages carry only _host/_path)
        assert exchanges[0].startswith("host#"), exchanges[0]
    # and the old _rid fan-out/self-join shape is gone
    assert "monotonically_increasing_id" not in plan


def test_robots_slots_into_the_warc_front_door(spark, tmp_path):
    """Composition: WARC scan -> robots politeness -> URL dedup. The
    blocked page drops BEFORE canonicalization/dedup (policy first, so
    disallowed payloads never reach content stages), the allowed pages'
    raw spellings still collapse per canonical URL."""
    import gzip

    from semantic_vector_search_system_spark.operators.dedup import url_dedup
    from semantic_vector_search_system_spark.sources.warc import read_warc

    def record(rid, uri, body):
        head = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Record-ID: {rid}\r\n"
            f"WARC-Target-URI: {uri}\r\n"
            "WARC-Date: 2026-08-15T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode()
        return head + body + b"\r\n\r\n"

    arc = (
        record("1", "http://a.example/page?utm_source=x", b"payload one")
        + record("2", "HTTP://A.EXAMPLE:80/page", b"payload one refetch")
        + record("3", "http://a.example/private/secret", b"blocked payload")
    )
    (tmp_path / "c.warc.gz").write_bytes(gzip.compress(arc))
    rules = spark.createDataFrame(
        [("a.example", "disallow", "/private/")],
        "host string, rule string, prefix string",
    )
    pages = read_warc(spark, str(tmp_path)).select(
        F.col("record_id").cast("long").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.length("payload").cast("long").alias("n_bytes"),
    )
    polite = apply_robots(pages, rules).filter("robots_allowed")
    out = url_dedup(polite, url_col="url", id_col="doc_id", length_col="n_bytes")
    rows = {r["canonical_url"]: r for r in out.collect()}
    assert set(rows) == {"http://a.example/page"}  # blocked page never dedups
    assert rows["http://a.example/page"]["n_fetches"] == 2
    assert rows["http://a.example/page"]["kept_id"] == 2  # longest payload
