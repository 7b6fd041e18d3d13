"""URL canonicalization + URL-keyed refetch dedup.

The canonical-form contract lives in functions/url.py's module docstring;
every rule is pinned here both on the Spark face and against the DuckDB
SQL twin (the catalog-oracle replay path).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.functions.url import (
    canonical_url,
    canonical_url_sql,
)
from semantic_vector_search_system_spark.operators.dedup import url_dedup

# (raw, expected canonical) — one case per contract rule plus the traps
CASES = [
    # scheme+host case, default port, trailing slash, tracking param,
    # param sort, fragment — all at once
    ("HTTP://WWW.Example.COM:80/a/b/?utm_source=x&id=2&b=1#frag",
     "http://example.com/a/b?b=1&id=2"),
    ("https://example.com:443/a/b?b=1&id=2",
     "https://example.com/a/b?b=1&id=2"),
    ("http://example.com", "http://example.com"),
    ("http://example.com/", "http://example.com"),      # bare-host slash
    ("http://example.com//", "http://example.com"),     # slash runs
    ("https://www.site.org/path/?fbclid=abc", "https://site.org/path"),
    ("ftp://Host.com:80/X/", "ftp://host.com:80/X"),    # :80 only http-default
    ("https://h.com:80/p", "https://h.com:80/p"),       # :80 not https-default
    ("http://h.com:8080/p", "http://h.com:8080/p"),     # real port kept
    ("http://www.www.double.com/", "http://www.double.com"),  # ONE www strip
    ("http://h.com/p?utm_campaign=1&utm_x=2", "http://h.com/p"),  # all tracked
    ("http://h.com/p?a=1&a=0", "http://h.com/p?a=0&a=1"),  # bytewise sort
    ("  HTTPS://A.B/?ref=z&z=9&a=1  ", "https://a.b?a=1&z=9"),  # trim + ref
    ("not a url", "not a url"),                          # opaque passthrough
    ("MiXeD Case No Scheme", "mixed case no scheme"),
]


def test_canonical_url_contract(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], "url string")
    got = [r[0] for r in df.select(canonical_url("url")).collect()]
    assert got == [e for _, e in CASES]


def test_canonical_url_sql_twin_matches_bytewise():
    con = duckdb.connect()
    sql = canonical_url_sql("url")
    for raw, expected in CASES:
        got = con.execute(
            f"SELECT {sql} FROM (SELECT ? AS url)", [raw]
        ).fetchone()[0]
        assert got == expected, raw


def test_url_dedup_keeps_longest_then_min_id(spark):
    rows = [
        # three spellings of one page; doc 2 has the longest payload
        (1, 100, "http://www.A.com/p/?utm_source=x"),
        (2, 300, "http://a.com/p"),
        (3, 300, "HTTP://A.COM:80/p#frag"),
        # a second page, single fetch
        (4, 50, "https://b.org/q?x=1"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long, url string")
    out = {
        r["canonical_url"]: r
        for r in url_dedup(df, length_col="n_chars").collect()
    }
    a = out["http://a.com/p"]
    assert a["n_fetches"] == 3
    assert a["n_raw_urls"] == 3
    assert a["kept_id"] == 2  # longest payload wins; min-id breaks the tie
    b = out["https://b.org/q?x=1"]
    assert (b["n_fetches"], b["n_raw_urls"], b["kept_id"]) == (1, 1, 4)


def test_url_dedup_null_length_loses_to_any_payload(spark):
    """r9 ADVICE: a NULL length must LOSE to any real payload (a null
    struct field sorts first under ascending struct MIN, so the raw
    -_len would have made the null-length row win) — and an all-null
    group falls back to min id, matching the oracle's NULLS LAST."""
    rows = [
        (1, None, "http://a.com/p"),       # null length: must lose
        (2, 5, "http://www.a.com/p/"),     # shortest real payload still wins
        (9, None, "https://c.net/r"),      # all-null group:
        (4, None, "https://c.net/r#f"),    #   min id wins
    ]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long, url string")
    out = {
        r["canonical_url"]: r["kept_id"]
        for r in url_dedup(df, length_col="n_chars").collect()
    }
    assert out["http://a.com/p"] == 2
    assert out["https://c.net/r"] == 4


def test_url_dedup_without_length_keeps_min_id(spark):
    rows = [(9, "http://a.com/p"), (4, "http://www.a.com/p")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    [r] = url_dedup(df).collect()
    assert r["kept_id"] == 4


def test_url_dedup_aggregate_has_map_side_partial(spark):
    """The keep-best must be a declarative min-struct AGGREGATE (map-side
    partial_min absorbs hot-URL refetch skew), never a window rank."""
    df = spark.createDataFrame(
        [(1, 10, "http://a.com/p")], "doc_id long, n_chars long, url string"
    )
    plan = url_dedup(df, length_col="n_chars")._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan or "partial_count" in plan
    assert "Window" not in plan


def test_snapshot_diff_statuses(spark):
    """added/removed/changed/unchanged per key; cosmetic case/punct churn
    is UNCHANGED (normalize-then-hash identity); duplicate keys within a
    side collapse by min-hash keep-one before the join."""
    from semantic_vector_search_system_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "the same page"), (2, "will be edited"), (3, "gets removed"),
         (4, "Cosmetic, CHURN only!"), (5, "dup key"), (5, "dup key")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "the same page"), (2, "now fully rewritten"),
         (4, "cosmetic churn only"), (5, "dup key"),
         (9, "brand new page")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged", 2: "changed", 3: "removed",
        4: "unchanged",  # normalization absorbs case + punctuation
        5: "unchanged",  # in-side dup collapsed, then matched
        9: "added",
    }
    row = {r["doc_id"]: r for r in snapshot_diff(old, new).collect()}
    assert row[3]["new_hash"] is None and row[9]["old_hash"] is None
