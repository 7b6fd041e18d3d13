"""WARC source connector — the CommonCrawl ingestion shape.

Production pre-training corpora start life as WARC archives (ISO 28500):
a `.warc` / `.warc.gz` file is a sequence of records, each a
``WARC/1.0`` header block (CRLF-terminated ``Name: value`` lines,
``Content-Length`` giving the payload size) followed by the payload and
a blank-line separator.  CommonCrawl's ``.warc.gz`` concatenates one
gzip MEMBER per record; python's zlib handles member-concatenated
streams natively.

Scale shape: the scan rides Spark's ``binaryFile`` source — one task per
archive file, which is exactly the industry-standard processing
granularity for WARC (a ~1 GB gzip archive is sequential by nature; the
100 TB crawl is tens of thousands of such files, so file-level
parallelism saturates any cluster).  Parsing runs in ``mapInPandas``
(stdlib-only: zlib), emitting one row per record with typed metadata and
the raw payload as an opaque ``binary`` column — the multimodal-column
contract (OPERATORS.md §multimodal): downstream stages (HTTP header
strip, text extraction, the curation funnel) are ordinary DataFrame
transformations.

No counterpart in the reference (its sources are JSONL, SURVEY §2.1
S1-S3); this extends the S-family toward the crawl pipeline the
LLM-data operators exist for.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: Output schema of :func:`read_warc` (one row per WARC record).
WARC_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "content_length long, payload binary"
)


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC archive (raw or member-concatenated gzip) into
    record dicts.  Pure function — unit-testable off-cluster, and the
    exact code the executors run.  Tolerant: a malformed tail stops the
    parse at the last whole record instead of raising (a truncated
    crawl file loses its tail record, not the batch)."""
    import zlib

    if data[:2] == b"\x1f\x8b":  # gzip magic: decompress ALL members
        out, d = [], data
        while d:
            o = zlib.decompressobj(wbits=zlib.MAX_WBITS | 16)
            try:
                out.append(o.decompress(d))
            except zlib.error:
                break
            d = o.unused_data
            if not o.eof:
                break
        data = b"".join(out)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break
        head = data[pos : head_end].decode("utf-8", errors="replace")
        lines = head.split("\r\n")
        if not lines or not lines[0].startswith("WARC/"):
            break
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        body_start = head_end + 4
        if body_start + clen > n:
            break  # truncated record
        records.append(
            {
                "record_id": fields.get("warc-record-id", ""),
                "warc_type": fields.get("warc-type", ""),
                "target_uri": fields.get("warc-target-uri", ""),
                "warc_date": fields.get("warc-date", ""),
                "content_type": fields.get("content-type", ""),
                "content_length": clen,
                "payload": data[body_start : body_start + clen],
            }
        )
        pos = body_start + clen
    return records


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: tuple[str, ...] | None = ("response",),
) -> DataFrame:
    """Scan WARC archives under ``path`` into one row per record
    (:data:`WARC_SCHEMA`).  ``warc_types`` filters record types
    executor-side before anything is emitted (a crawl archive is ~50%
    request/metadata records nobody trains on); ``None`` keeps all.
    """
    import pandas as pd

    types = tuple(warc_types) if warc_types is not None else None

    def parse(batches):
        for pdf in batches:
            rows = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content)):
                    if types is not None and rec["warc_type"] not in types:
                        continue
                    rec["warc_file"] = fpath
                    rows.append(rec)
            if rows:
                yield pd.DataFrame(rows)

    raw = spark.read.format("binaryFile").load(path).select("path", "content")
    return raw.mapInPandas(parse, schema=WARC_SCHEMA)


def write_warc(
    records: DataFrame,
    path: str,
    warc_type: str = "response",
    warc_date: str = "1970-01-01T00:00:00Z",
    compression: str | None = None,
) -> None:
    """WARC SINK — serialize ``(record_id, target_uri, payload binary)``
    rows into ``.warc`` archive files under ``path`` (one file per input
    partition, written EXECUTOR-side via foreachPartition: no driver
    collect, the inverse of :func:`read_warc`'s one-task-per-archive
    granularity).  Record order within and across files is whatever the
    partitioning delivered — the WARC contract (and :func:`read_warc`)
    carries identity in the headers, never in position.  Rows may carry
    their own ``warc_type`` / ``warc_date`` columns; otherwise the
    ``warc_type`` / ``warc_date`` arguments apply to every record (r10
    ADVICE: the date is caller data, not a constant of the sink).

    Header-injection guard (r10 ADVICE): record_id / target_uri /
    warc_type / warc_date are interpolated into the CRLF-framed header
    block, so a value containing a control character (CR/LF above all)
    would corrupt the archive framing — inject a phantom record on
    re-read or truncate parsing.  Such rows RAISE rather than encode:
    silently rewriting an identity header would break the round-trip
    contract below, and control characters in a URI are upstream
    garbage the crawl should drop explicitly.

    Filesystem contract: ``path`` must be visible to driver AND
    executors under the same name (local mode, or a shared/NFS mount) —
    the driver creates the directory, executors ``open()`` files inside
    it.  On a real cluster with only object storage, write the records
    relation as parquet and run this sink from a node that mounts the
    shared path.

    Round-trip contract (tested): ``read_warc(write_warc(df))`` returns
    the same (record_id, warc_type, target_uri, payload) set.

    ``compression="gzip"`` writes ``.warc.gz`` in the CommonCrawl
    convention — one gzip MEMBER per record, so downstream tooling can
    seek to a record boundary and decompress just that member (and
    :func:`parse_warc_bytes` already consumes member-concatenated gzip).
    ``None`` (default) writes raw ``.warc``.  Anything else raises —
    name the unsupported codec instead of silently writing raw.
    """
    import os

    if compression not in (None, "gzip"):
        raise ValueError(
            f"write_warc: unsupported compression {compression!r} — "
            "use 'gzip' (one member per record, the CommonCrawl "
            "convention) or None"
        )
    cols = ["record_id", "target_uri", "payload"]
    has_type = "warc_type" in records.columns
    if has_type:
        cols.append("warc_type")
    has_date = "warc_date" in records.columns
    if has_date:
        cols.append("warc_date")
    os.makedirs(path, exist_ok=True)

    def write_partition(rows):
        import gzip
        import os
        import re
        import uuid

        ctrl = re.compile(r"[\x00-\x1f\x7f]")

        def header_value(name: str, v) -> str:
            s = str(v)
            if ctrl.search(s):
                raise ValueError(
                    f"write_warc: {name}={s!r} contains a control "
                    "character — it would corrupt the WARC header "
                    "framing (record injection / parse truncation on "
                    "re-read); drop or sanitize the row upstream"
                )
            return s

        buf = []
        for r in rows:
            payload = bytes(r["payload"]) if r["payload"] is not None else b""
            rtype = r["warc_type"] if has_type else warc_type
            rdate = r["warc_date"] if has_date else warc_date
            head = (
                "WARC/1.0\r\n"
                f"WARC-Type: {header_value('warc_type', rtype)}\r\n"
                f"WARC-Record-ID: {header_value('record_id', r['record_id'])}\r\n"
                f"WARC-Target-URI: {header_value('target_uri', r['target_uri'])}\r\n"
                f"WARC-Date: {header_value('warc_date', rdate)}\r\n"
                "Content-Type: application/http; msgtype=response\r\n"
                f"Content-Length: {len(payload)}\r\n"
                "\r\n"
            ).encode()
            rec = head + payload + b"\r\n\r\n"
            if compression == "gzip":
                # mtime=0: reproducible bytes (the gzip header embeds a
                # timestamp otherwise — same records, different archive)
                rec = gzip.compress(rec, mtime=0)
            buf.append(rec)
        if buf:
            ext = "warc.gz" if compression == "gzip" else "warc"
            fname = os.path.join(path, f"part-{uuid.uuid4().hex}.{ext}")
            with open(fname, "wb") as f:
                f.write(b"".join(buf))

    records.select(*cols).foreachPartition(write_partition)


def http_response_body(payload: Column | str) -> Column:
    """Strip the HTTP response envelope from a ``response`` record's
    payload: everything after the first CRLFCRLF.  Pure expression
    (no Python): locate the separator in the latin-1 decode (a
    byte-transparent charset, so offsets are byte offsets) and slice
    the binary.  Records without an HTTP envelope pass through whole."""
    c = F.col(payload) if isinstance(payload, str) else payload
    s = F.decode(c, "ISO-8859-1")
    sep = F.instr(s, "\r\n\r\n")
    return F.when(
        sep > 0, F.encode(F.substring(s, sep + 4, F.length(s)), "ISO-8859-1")
    ).otherwise(c)


def http_status(payload: Column | str) -> Column:
    """HTTP status code of a ``response`` payload (int; NULL when the
    payload has no HTTP status line)."""
    c = F.col(payload) if isinstance(payload, str) else payload
    first = F.substring(F.decode(c, "ISO-8859-1"), 1, 64)
    code = F.regexp_extract(first, r"^HTTP/[0-9.]+ (\d{3})", 1)
    return F.when(code != "", code.cast("int"))


def html_to_text(html: Column | str) -> Column:
    """Crude HTML -> text for quality gating: drop script/style blocks,
    strip tags, decode the five predefined entities, collapse
    whitespace.  Pure expressions (RE2-safe patterns) — a real
    extractor (trafilatura etc.) plugs in at the same column slot; this
    keeps the funnel runnable on raw crawl with zero dependencies."""
    c = F.col(html) if isinstance(html, str) else html
    t = F.decode(c, "UTF-8")
    t = F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?is)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " "),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))
