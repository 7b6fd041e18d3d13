"""URL canonicalization — the CommonCrawl-pipeline stage between the WARC
scan (``sources/warc.py``) and content dedup.

Crawls see the same page under many raw spellings (scheme/host case,
``www.`` prefix, default ports, trailing slashes, tracking parameters,
fragment anchors, query-parameter order).  URL-keyed dedup BEFORE content
hashing removes the bulk of refetch duplicates with a pure string
canonicalization + one keyed aggregate — far cheaper than shingling the
payloads — so production pipelines (CCNet, C4, RefinedWeb all do this)
run it first.

Everything here is a pure Catalyst expression (no UDF): the whole
canonicalization inlines into whole-stage codegen and survives pushdown.
:func:`canonical_url_sql` emits the byte-identical DuckDB twin so catalog
oracles can replay it (regex subset is RE2-safe, list ops map 1:1).

Canonical form (the contract, pinned by tests/test_url.py):

* fragment (``#...``) dropped;
* scheme lowercased; host lowercased, one leading ``www.`` stripped,
  scheme-default port (``:80`` for http, ``:443`` for https) stripped;
* trailing ``/`` runs stripped from the path (``/a/`` == ``/a``, bare
  host path becomes empty);
* tracking parameters dropped (``utm_*``, ``fbclid``, ``gclid``,
  ``msclkid``, ``mc_cid``, ``mc_eid``, ``ref``), remaining params sorted
  bytewise and re-joined, empty query omitted entirely;
* inputs without ``://`` (not absolute URLs) canonicalize to
  ``lower(trim(input))`` — opaque but stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# one alternation shared by the Spark and DuckDB faces; Java regex and RE2
# both accept it (no backrefs, no lookaround)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]+|fbclid|gclid|msclkid|mc_cid|mc_eid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def canonical_url(url: Column | str) -> Column:
    """Canonical form of an absolute http(s) URL (see module contract)."""
    raw = F.trim(_col(url))
    u0 = F.regexp_replace(raw, r"#.*$", "")  # fragment never participates
    scheme = F.lower(F.regexp_extract(u0, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_extract(u0, _HOST_RE, 1))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = (
        F.when(scheme == "http", F.regexp_replace(host, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(host, r":443$", ""))
        .otherwise(host)
    )
    path = F.regexp_replace(F.regexp_extract(u0, _PATH_RE, 1), r"/+$", "")
    query = F.regexp_extract(u0, _QUERY_RE, 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (~p.rlike(TRACKING_PARAM_RE)) & (p != F.lit("")),
        )
    )
    qcanon = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    # non-absolute inputs: opaque-but-stable lowercase passthrough
    return F.when(scheme == "", F.lower(raw)).otherwise(canon)


def canonical_url_sql(expr: str) -> str:
    """DuckDB SQL twin of :func:`canonical_url` over ``expr`` — every stage
    maps 1:1 (regexp_extract group refs, list_filter/list_sort bytewise on
    ASCII, CASE for the scheme-default port)."""
    raw = f"trim({expr})"
    u0 = f"regexp_replace({raw}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u0}, '{_SCHEME_RE}', 1))"
    hostport = f"lower(regexp_extract({u0}, '{_HOST_RE}', 1))"
    host = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_replace(regexp_extract({u0}, '{_PATH_RE}', 1), '/+$', '')"
    query = f"regexp_extract({u0}, '\\?([^#]*)', 1)"
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p -> NOT regexp_matches(p, '{TRACKING_PARAM_RE}') AND p <> ''))"
    )
    qcanon = f"array_to_string({params}, '&')"
    canon = (
        f"concat({scheme}, '://', {host}, {path}, "
        f"CASE WHEN {qcanon} <> '' THEN concat('?', {qcanon}) ELSE '' END)"
    )
    return f"CASE WHEN {scheme} = '' THEN lower({raw}) ELSE {canon} END"
