"""WARC source connector (sources/warc.py): record parsing (raw +
member-gzip), type filtering, HTTP envelope handling, the crude HTML
text extractor, and the crawl -> curation-funnel composition."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from semantic_vector_search_system_spark.sources.warc import (
    html_to_text,
    http_response_body,
    http_status,
    parse_warc_bytes,
    read_warc,
)


def _record(rec_id: str, rtype: str, uri: str, payload: bytes) -> bytes:
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
        f"WARC-Target-URI: {uri}\r\n"
        "WARC-Date: 2026-08-15T00:00:00Z\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode()
    return head + payload + b"\r\n\r\n"


def _http(body: bytes, status: int = 200) -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: text/html\r\n\r\n".encode()
        + body
    )


HTML = (
    b"<html><head><style>p{color:red}</style>"
    b"<script>var x = '<p>not text</p>';</script></head>"
    b"<body><h1>Title &amp; More</h1><p>hello   world</p></body></html>"
)


def _archive() -> bytes:
    return (
        _record("r1", "response", "http://a.example/x", _http(HTML))
        + _record("r2", "request", "http://a.example/x", b"GET /x HTTP/1.1\r\n")
        + _record("r3", "response", "http://b.example/y", _http(b"plain", 404))
    )


def test_parse_warc_bytes_raw_and_member_gzip():
    raw = _archive()
    # member-per-record gzip, the CommonCrawl layout
    gz = b"".join(
        gzip.compress(_record(*args))
        for args in (
            ("r1", "response", "http://a.example/x", _http(HTML)),
            ("r2", "request", "http://a.example/x", b"GET /x HTTP/1.1\r\n"),
            ("r3", "response", "http://b.example/y", _http(b"plain", 404)),
        )
    )
    for data in (raw, gz):
        recs = parse_warc_bytes(data)
        assert [r["warc_type"] for r in recs] == ["response", "request", "response"]
        assert recs[0]["target_uri"] == "http://a.example/x"
        assert recs[0]["content_length"] == len(_http(HTML))
        assert recs[0]["payload"].endswith(b"</html>")
        assert recs[2]["payload"] == _http(b"plain", 404)


def test_parse_warc_truncated_tail_drops_last_record_only():
    data = _archive()
    truncated = data[: len(data) - 20]  # cut into r3's payload
    recs = parse_warc_bytes(truncated)
    assert [r["record_id"] for r in recs] == ["<urn:uuid:r1>", "<urn:uuid:r2>"]
    assert parse_warc_bytes(b"") == []
    assert parse_warc_bytes(b"garbage no warc") == []


def test_read_warc_scan_filters_types(spark, tmp_path):
    (tmp_path / "seg0.warc.gz").write_bytes(gzip.compress(_archive()))
    (tmp_path / "seg1.warc").write_bytes(_archive())
    df = read_warc(spark, str(tmp_path))
    rows = df.collect()
    assert len(rows) == 4  # 2 files x 2 response records (requests dropped)
    assert {r["warc_type"] for r in rows} == {"response"}
    both = read_warc(spark, str(tmp_path), warc_types=None)
    assert both.count() == 6


def test_http_envelope_and_status(spark, tmp_path):
    (tmp_path / "seg.warc").write_bytes(_archive())
    df = read_warc(spark, str(tmp_path)).select(
        "target_uri",
        http_status("payload").alias("status"),
        http_response_body("payload").alias("body"),
    )
    by_uri = {r["target_uri"]: r for r in df.collect()}
    assert by_uri["http://a.example/x"]["status"] == 200
    assert bytes(by_uri["http://a.example/x"]["body"]) == HTML
    assert by_uri["http://b.example/y"]["status"] == 404
    assert bytes(by_uri["http://b.example/y"]["body"]) == b"plain"
    # payload without an HTTP envelope passes through whole
    naked = spark.createDataFrame([(b"no envelope",)], "payload binary").select(
        http_response_body("payload").alias("b"),
        http_status("payload").alias("s"),
    ).collect()[0]
    assert bytes(naked["b"]) == b"no envelope" and naked["s"] is None


def test_html_to_text_strips_script_style_tags_entities(spark):
    out = (
        spark.createDataFrame([(HTML,)], "html binary")
        .select(html_to_text("html").alias("t"))
        .collect()[0]["t"]
    )
    assert out == "Title & More hello world"
    assert "not text" not in out and "color" not in out


def test_write_warc_read_warc_round_trip(spark, tmp_path):
    """The WARC SINK (r10): executor-side foreachPartition serialization;
    read_warc(write_warc(df)) must return the same (record_id, warc_type,
    target_uri, payload) set regardless of partitioning / file split."""
    from semantic_vector_search_system_spark.sources.warc import write_warc

    rows = [
        (str(i), f"http://site.example/{i}", _http(f"body {i}".encode()))
        for i in range(7)
    ]
    df = spark.createDataFrame(
        rows, "record_id string, target_uri string, payload binary"
    ).repartition(3)
    path = str(tmp_path / "sink")
    write_warc(df, path)
    back = {
        (r["record_id"], r["target_uri"], bytes(r["payload"]))
        for r in read_warc(spark, path).collect()
    }
    assert back == {(rid, uri, p) for rid, uri, p in rows}
    # every record carries the default type and parses as response
    assert read_warc(spark, path, warc_types=("response",)).count() == 7
    # per-row warc_type column wins over the default
    df2 = spark.createDataFrame(
        [("9", "http://site.example/9", b"GET /", "request")],
        "record_id string, target_uri string, payload binary, warc_type string",
    )
    path2 = str(tmp_path / "sink2")
    write_warc(df2, path2)
    assert read_warc(spark, path2, warc_types=None).collect()[0]["warc_type"] == "request"
    assert read_warc(spark, path2).count() == 0  # response filter drops it


def test_warc_to_curation_gates_composition(spark, tmp_path):
    """The crawl shape end to end: WARC scan -> HTTP body -> text ->
    the funnel's length gate — a 25-token page survives, the tiny page
    and the 404 body do not."""
    from semantic_vector_search_system_spark.functions.text import tokenize

    long_words = " ".join(f"w{i}" for i in range(25)).encode()
    arc = (
        _record("p1", "response", "http://long.example/", _http(b"<p>" + long_words + b"</p>"))
        + _record("p2", "response", "http://short.example/", _http(b"<p>tiny</p>"))
        + _record("p3", "response", "http://err.example/", _http(b"nope", 404))
    )
    (tmp_path / "crawl.warc.gz").write_bytes(gzip.compress(arc))
    docs = (
        read_warc(spark, str(tmp_path))
        .filter(http_status("payload") == 200)
        .select(
            F.col("target_uri").alias("doc_id"),
            html_to_text(http_response_body("payload")).alias("text"),
        )
    )
    survivors = docs.filter(F.size(tokenize(F.col("text"))) >= 20)
    assert [r["doc_id"] for r in survivors.collect()] == ["http://long.example/"]


def test_write_warc_rejects_control_chars_and_takes_row_dates(spark, tmp_path):
    """r10 ADVICE: header values interpolate into CRLF framing — a URI
    carrying CR/LF must RAISE (silent encoding would corrupt identity or
    inject phantom records on re-read), and WARC-Date comes from the row
    (or the parameter), never a hardcoded constant."""
    import pytest as _pytest

    from semantic_vector_search_system_spark.sources.warc import (
        read_warc,
        write_warc,
    )

    # per-row dates round-trip
    df = spark.createDataFrame(
        [
            ("<urn:a>", "http://x.example/a", bytearray(b"A"),
             "2001-02-03T04:05:06Z"),
            ("<urn:b>", "http://x.example/b", bytearray(b"B"),
             "2011-12-13T14:15:16Z"),
        ],
        "record_id string, target_uri string, payload binary, warc_date string",
    )
    path = str(tmp_path / "dated")
    write_warc(df, path)
    got = {
        r["record_id"]: r["warc_date"]
        for r in read_warc(spark, path).collect()
    }
    assert got == {
        "<urn:a>": "2001-02-03T04:05:06Z",
        "<urn:b>": "2011-12-13T14:15:16Z",
    }

    # CR/LF in a header value raises executor-side (surfaces as a job error)
    bad = spark.createDataFrame(
        [("<urn:evil>", "http://x.example/a\r\nWARC-Type: fake",
          bytearray(b"A"))],
        "record_id string, target_uri string, payload binary",
    )
    with _pytest.raises(Exception, match="control character"):
        write_warc(bad, str(tmp_path / "bad"))


def test_write_warc_gzip_member_per_record_round_trip(spark, tmp_path):
    """r12: compression='gzip' writes .warc.gz in the CommonCrawl
    convention — ONE gzip member per record (seekable record boundaries;
    parse_warc_bytes consumes member-concatenated gzip) — and the
    round-trip returns the identical record set.  Unsupported codecs
    raise by name."""
    import os

    import pytest

    from semantic_vector_search_system_spark.sources.warc import write_warc

    rows = [
        (str(i), f"http://site.example/{i}", _http(f"gz body {i}".encode()))
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "record_id string, target_uri string, payload binary"
    ).repartition(2)
    path = str(tmp_path / "gz_sink")
    write_warc(df, path, compression="gzip")
    files = [f for f in os.listdir(path) if not f.startswith(".")]
    assert files and all(f.endswith(".warc.gz") for f in files)
    # member-per-record: each archive holds as many gzip members as
    # records, so counting member magics == counting records
    n_members = 0
    n_records = 0
    for f in files:
        data = open(os.path.join(path, f), "rb").read()
        assert data[:2] == b"\x1f\x8b"
        n_members += data.count(b"\x1f\x8b\x08")
        blob = b""
        pos = 0
        import zlib

        while pos < len(data):
            dec = zlib.decompressobj(16 + zlib.MAX_WBITS)
            blob += dec.decompress(data[pos:])
            rest = dec.unused_data
            pos = len(data) - len(rest)
            if not rest:
                break
        n_records += blob.count(b"WARC/1.0")
    assert n_members == n_records == 5
    back = {
        (r["record_id"], r["target_uri"], bytes(r["payload"]))
        for r in read_warc(spark, path).collect()
    }
    assert back == {(rid, uri, p) for rid, uri, p in rows}

    with pytest.raises(ValueError, match="zstd"):
        write_warc(df, str(tmp_path / "bad"), compression="zstd")
