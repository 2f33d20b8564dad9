"""L73 — PDF text extraction (the document-format member of the
text-QA family: l70 HTML, l71 conversations, l72 encoding, l73 PDF).

Web crawls are full of PDFs; every pretraining pipeline runs a
pdftotext-style extract before any text operator sees the document.
This module implements the core of that step from scratch — no PDF
library — against the public PDF 1.4 specification (ISO 32000-1):

- ``build_pdf``: a minimal conformant document — catalog/pages/page/
  font objects, a FlateDecode content stream (zlib is stdlib) of
  BT..ET text blocks (Tf/TL/Td, one ``Tj`` per paragraph separated by
  ``T*``), a correct byte-offset xref table and trailer. Literal
  strings escape ``\\ ( )`` per §7.3.4.2.
- ``extract_pdf_text``: walks the indirect objects, inflates every
  /FlateDecode content stream (raw streams pass through), tokenizes
  the content stream (literal strings with escapes + balanced parens,
  hex strings, arrays, operators), and collects the text-showing
  operators — ``Tj``, ``'``, ``\"``, and ``TJ`` (string elements
  concatenated; kerning numbers <= -180 milliunits render as a word
  space, the pdftotext heuristic) — breaking lines at ``T*``/``Td``/
  ``TD``/``ET``. Honest subset: one-byte encodings (byte == Latin-1
  code point — the corpus is ASCII); /Type0 composite fonts, CMaps,
  encrypted files, and unknown stream filters RAISE (the poison-pill
  contract), never silently garble.

Closed-form oracle (the l70 playbook, same template): the page is a
pure function of documents.text (words regrouped into 12-word
paragraphs), so DuckDB recomputes the expected extraction from the
SOURCE — a hash match certifies build -> deflate -> inflate ->
tokenize -> unescape -> reflow end-to-end.

Scale: one Arrow-batched pandas pass, map-only, no shuffle; cost
linear in PDF bytes. Malformed payloads yield ok=0 rows.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.html_extract import split_paragraphs, _WS_RE
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

def _esc_literal(s: str) -> bytes:
    """PDF literal-string escaping (§7.3.4.2); input must be
    Latin-1-representable (one byte per char — the honest subset)."""
    try:
        b = s.encode("latin-1")
    except UnicodeEncodeError as exc:
        raise ValueError("build_pdf subset is Latin-1 text") from exc
    return (
        b.replace(b"\\", b"\\\\").replace(b"(", b"\\(").replace(b")", b"\\)")
    )


def build_pdf(text: str, *, compress: bool = True, objstm: bool = False) -> bytes:
    """Deterministic one-page PDF from ``text``: the shared fixture
    reflow (html_extract.split_paragraphs — ONE definition, review-2
    #4), one Tj per line, T* line advances, FlateDecode content
    stream, correct xref offsets. ``objstm`` emits the PDF 1.5 shape
    instead (VERDICT r11 #3 — the default for post-2005 writers): the
    four dict objects packed into one compressed /Type/ObjStm (§7.5.7
    — N obj-number/offset pairs, then the bodies at /First+offset; a
    stream itself cannot live in an ObjStm, so the content stream
    stays top-level), and the classic xref table + trailer replaced
    by a /Type/XRef CROSS-REFERENCE STREAM (§7.5.8: /W [1 4 2]
    packed binary rows — type 1 = byte offset, type 2 = (objstm,
    index))."""
    paras = split_paragraphs(text)
    content = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
    for i, p in enumerate(paras):
        if i:
            content += b"T*\n"
        content += b"(" + _esc_literal(p) + b") Tj\n"
    content += b"ET"
    if compress or objstm:
        data = zlib.compress(bytes(content))
        filt = b" /Filter /FlateDecode"
    else:
        data = bytes(content)
        filt = b""
    dicts = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        3: b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 4 0 R >>",
        5: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    content_obj = (
        b"<< /Length " + str(len(data)).encode() + filt + b" >>\nstream\n"
        + data + b"\nendstream"
    )
    if not objstm:
        objs = [dicts[1], dicts[2], dicts[3], content_obj, dicts[5]]
        out = bytearray(b"%PDF-1.4\n%\xc2\xa5\xc2\xb1\n")
        offsets = []
        for i, body in enumerate(objs, start=1):
            offsets.append(len(out))
            out += str(i).encode() + b" 0 obj\n" + body + b"\nendobj\n"
        xref_at = len(out)
        out += b"xref\n0 " + str(len(objs) + 1).encode() + b"\n"
        out += b"0000000000 65535 f \n"
        for off in offsets:
            out += f"{off:010d} 00000 n \n".encode()
        out += (
            b"trailer\n<< /Size " + str(len(objs) + 1).encode()
            + b" /Root 1 0 R >>\nstartxref\n" + str(xref_at).encode()
            + b"\n%%EOF\n"
        )
        return bytes(out)
    # --- PDF 1.5: ObjStm (obj 6) + cross-reference stream (obj 7) ---
    inner = sorted(dicts)  # obj numbers packed, in index order
    bodies = [dicts[n] for n in inner]
    offs, at = [], 0
    for b in bodies:
        offs.append(at)
        at += len(b) + 1  # bodies joined by single \n
    pair_table = (
        b" ".join(
            str(n).encode() + b" " + str(o).encode()
            for n, o in zip(inner, offs)
        )
        + b"\n"
    )
    first = len(pair_table)
    stm_plain = pair_table + b"\n".join(bodies) + b"\n"
    stm_data = zlib.compress(stm_plain)
    objstm_obj = (
        b"<< /Type /ObjStm /N " + str(len(inner)).encode()
        + b" /First " + str(first).encode()
        + b" /Length " + str(len(stm_data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + stm_data + b"\nendstream"
    )
    out = bytearray(b"%PDF-1.5\n%\xc2\xa5\xc2\xb1\n")
    top_offsets: dict[int, int] = {}
    for num, body in ((4, content_obj), (6, objstm_obj)):
        top_offsets[num] = len(out)
        out += str(num).encode() + b" 0 obj\n" + body + b"\nendobj\n"
    xref_at = len(out)
    # /W [1 4 2] rows for objects 0..7: type 0 free head; type 2 =
    # (containing objstm, index); type 1 = byte offset
    import struct

    idx_in_stm = {n: i for i, n in enumerate(inner)}
    rows = bytearray()
    rows += struct.pack(">BIH", 0, 0, 0xFFFF)  # obj 0: free list head
    for num in range(1, 8):
        if num in idx_in_stm:
            rows += struct.pack(">BIH", 2, 6, idx_in_stm[num])
        else:
            rows += struct.pack(">BIH", 1, top_offsets.get(num, xref_at), 0)
    xr_data = zlib.compress(bytes(rows))
    out += (
        b"7 0 obj\n<< /Type /XRef /Size 8 /W [1 4 2] /Root 1 0 R "
        b"/Length " + str(len(xr_data)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + xr_data
        + b"\nendstream\nendobj\n"
    )
    out += b"startxref\n" + str(xref_at).encode() + b"\n%%EOF\n"
    return bytes(out)


_STREAM_RE = re.compile(rb"stream\r?\n")


def _object_streams(
    data: bytes,
) -> list[tuple[bytes, bytes, bytes, tuple[int, int]]]:
    """Every (object dict bytes, stream payload bytes, raw endstream
    slice, payload byte span) tuple, located by the obj/endobj
    structure. Length comes from a DIRECT /Length integer (the
    ``(?!\\d)`` anchor stops backtracking from misreading an indirect
    ``/Length 12 0 R`` as length 1 — ADVICE r11 #1); the indirect
    form and a missing /Length fall back to the endstream scan
    (review-2 #2), which strips AT MOST ONE EOL sequence per ISO
    32000 §7.3.8.1 (ADVICE r11 #2 — a blanket rstrip truncated
    payloads whose real data ends in EOL bytes, common in Flate
    output). The raw slice lets the FlateDecode path retry when a
    nonconforming writer omitted the EOL and the one-EOL strip took a
    data byte. The spans let the caller excise payload bytes when
    scanning the document STRUCTURE (review-2 #1)."""
    out = []
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        dict_start = data.rfind(b"obj", 0, m.start())
        head = data[dict_start : m.start()] if dict_start >= 0 else b""
        lm = re.search(rb"/Length\s+(\d+)(?!\d)(?!\s+\d+\s+R)", head)
        if lm:
            end = m.end() + int(lm.group(1))
            payload = data[m.end() : end]
            raw = payload
            endpos = data.find(b"endstream", end)
        else:
            endpos = data.find(b"endstream", m.end())
            if endpos < 0:
                raise ValueError("unterminated stream object")
            raw = data[m.end() : endpos]
            if raw.endswith(b"\r\n"):
                payload = raw[:-2]
            elif raw.endswith((b"\n", b"\r")):
                payload = raw[:-1]
            else:
                payload = raw
            end = m.end() + len(payload)
        if endpos < 0:
            raise ValueError("unterminated stream object")
        out.append((head, payload, raw, (m.end(), end)))
        pos = endpos + 9
    return out


_ESCAPES = {
    b"n"[0]: b"\n", b"r"[0]: b"\r", b"t"[0]: b"\t", b"b"[0]: b"\b",
    b"f"[0]: b"\f", b"("[0]: b"(", b")"[0]: b")", b"\\"[0]: b"\\",
}


def _parse_literal(data: bytes, i: int) -> tuple[bytes, int]:
    """Literal string starting at the '(' — balanced parens, escape
    sequences incl. up-to-3-digit octal (§7.3.4.2); returns (bytes,
    index past the closing paren)."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash
            if i + 1 >= n:
                raise ValueError("truncated escape in literal string")
            nxt = data[i + 1]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
            elif 0x30 <= nxt <= 0x37:  # octal, 1-3 digits
                j = i + 1
                oct_digits = []
                while j < n and len(oct_digits) < 3 and 0x30 <= data[j] <= 0x37:
                    oct_digits.append(data[j] - 0x30)
                    j += 1
                v = 0
                for d in oct_digits:
                    v = v * 8 + d
                out.append(v & 0xFF)
                i = j
            elif nxt in (0x0A, 0x0D):  # line continuation
                i += 2
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
            else:  # spec: lone backslash is dropped
                out.append(nxt)
                i += 2
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            i += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
            out.append(c)
            i += 1
        else:
            out.append(c)
            i += 1
    raise ValueError("unterminated literal string")


def _parse_hex(data: bytes, i: int) -> tuple[bytes, int]:
    end = data.find(b">", i)
    if end < 0:
        raise ValueError("unterminated hex string")
    hx = re.sub(rb"\s", b"", data[i + 1 : end])
    if len(hx) % 2:
        hx += b"0"  # §7.3.4.3: odd final digit implies trailing 0
    return bytes.fromhex(hx.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[-+.0-9]+")
_OP_RE = re.compile(rb"[A-Za-z'\"*]+")


def _content_text(content: bytes) -> str:
    """Text-showing walk of one content stream: Tj / ' / \" show the
    pending strings; TJ concatenates its array's strings with a word
    space at kerning adjustments <= -180; T*/Td/TD/ET/'/\" break
    lines. One-byte Latin-1 decoding (the honest subset)."""
    lines: list[list[bytes]] = [[]]
    pending: list[bytes] = []  # operand-stack strings awaiting an operator
    in_array: list[bytes] | None = None
    i, n = 0, len(content)

    def newline() -> None:
        if lines[-1]:
            lines.append([])

    while i < n:
        c = content[i]
        if c in b" \t\r\n\x00":
            i += 1
        elif c == 0x28:  # literal string
            s, i = _parse_literal(content, i)
            (in_array if in_array is not None else pending).append(s)
        elif c == 0x3C:  # << dict or hex string
            if content.startswith(b"<<", i):
                i += 2
            else:
                s, i = _parse_hex(content, i)
                (in_array if in_array is not None else pending).append(s)
        elif c == 0x5B:  # [
            in_array = []
            i += 1
        elif c == 0x5D:  # ]
            pending.append(b"".join(in_array or []))
            in_array = None
            i += 1
        elif c == 0x2F:  # /name
            m = re.compile(rb"/[^\s()<>\[\]/]*").match(content, i)
            i = m.end()
        elif _NUM_RE.match(content, i):
            m = _NUM_RE.match(content, i)
            if in_array is not None:
                try:
                    if float(m.group()) <= -180:
                        in_array.append(b" ")  # kerning gap = word space
                except ValueError:
                    pass
            i = m.end()
        else:
            m = _OP_RE.match(content, i)
            if not m:
                i += 1
                continue
            op = m.group()
            i = m.end()
            if op == b"Tj":
                lines[-1].extend(pending)
            elif op in (b"'", b'"'):
                newline()
                lines[-1].extend(pending)
            elif op == b"TJ":
                lines[-1].extend(pending)
            elif op in (b"T*", b"Td", b"TD", b"ET"):
                newline()
            pending = []
    text = "\n".join(
        b"".join(parts).decode("latin-1") for parts in lines
    )
    out_lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in out_lines if ln)


def _inflate(head: bytes, payload: bytes, raw: bytes) -> bytes:
    """Apply the declared stream filter: FlateDecode inflates, no
    filter passes through, anything else RAISES (poison-pill)."""
    fm = re.search(rb"/Filter\s*(/\w+|\[[^\]]*\])", head)
    if not fm:
        return payload
    filt = fm.group(1)
    if b"FlateDecode" not in filt:
        raise ValueError(f"unsupported stream filter {filt!r}")
    try:
        return zlib.decompress(payload)
    except zlib.error:
        # a writer that omitted the EOL before 'endstream' while the
        # Flate data itself ends in EOL bytes: the one-EOL strip took
        # a data byte. decompressobj stops at the DEFLATE final
        # block, so the raw slice (data + at most one trailing EOL)
        # inflates exactly.
        try:
            return zlib.decompressobj().decompress(raw)
        except zlib.error as exc:
            raise ValueError("corrupt FlateDecode stream") from exc


def _objstm_objects(head: bytes, payload: bytes) -> list[tuple[int, bytes]]:
    """Parse an INFLATED /Type/ObjStm payload (§7.5.7): /N
    obj-number/offset integer pairs in the first /First bytes, object
    bodies at /First+offset. Returns [(obj number, body bytes)];
    malformed headers, short pair tables, and out-of-range offsets
    RAISE (the poison-pill contract — never a silent empty)."""
    nm = re.search(rb"/N\s+(\d+)(?!\d)", head)
    fm = re.search(rb"/First\s+(\d+)(?!\d)", head)
    if not nm or not fm:
        raise ValueError("ObjStm missing /N or /First")
    n, first = int(nm.group(1)), int(fm.group(1))
    if first > len(payload):
        raise ValueError("ObjStm /First beyond payload")
    toks = payload[:first].split()
    if len(toks) < 2 * n:
        raise ValueError("truncated ObjStm pair table")
    try:
        pairs = [(int(toks[2 * i]), int(toks[2 * i + 1])) for i in range(n)]
    except ValueError as exc:
        raise ValueError("non-integer ObjStm pair table") from exc
    out = []
    for k, (num, off) in enumerate(pairs):
        start = first + off
        end = first + pairs[k + 1][1] if k + 1 < n else len(payload)
        if not 0 <= start <= end <= len(payload):
            raise ValueError("ObjStm object offset out of range")
        out.append((num, payload[start:end]))
    return out


def extract_pdf_text(data: bytes) -> str:
    """PDF bytes -> extracted text (see module docstring for the
    honest subset). Raises on bad magic, encryption, composite fonts,
    unknown stream filters, and truncation — never silently garbles.
    PDF 1.5 object streams are unpacked and their contained objects
    join the STRUCTURE scan (VERDICT r11 #3 — a /Type0 font hidden in
    a compressed ObjStm must still poison-pill); /Type/XRef
    cross-reference streams are recognized and their binary payload
    excluded from content parsing (offset tables aren't needed — the
    walk is structural — but their bytes could contain 'BT' by
    chance)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF header)")
    streams = _object_streams(data)
    # poison-pill scans run over the document STRUCTURE (payload
    # bytes excised) — a document whose TEXT mentions "/Type0" must
    # not be rejected (review-2 #1: whole-file substring checks
    # false-tripped on legitimate raw-stream content)
    parts, at = [], 0
    for _, _, _, (s, e) in streams:
        parts.append(data[at:s])
        at = e
    parts.append(data[at:])
    structure = [b"".join(parts)]
    # /Encrypt gates BEFORE any inflation: in an encrypted file the
    # stream bytes are ciphertext and would misreport as corrupt Flate
    if b"/Encrypt" in structure[0]:
        raise ValueError("encrypted PDF not supported")
    contents = []
    for head, payload, raw, _span in streams:
        tm = re.search(rb"/Type\s*/(\w+)", head)
        stype = tm.group(1) if tm else b""
        if stype == b"ObjStm":
            for _num, body in _objstm_objects(head, _inflate(head, payload, raw)):
                structure.append(body)
        elif stype == b"XRef":
            continue  # binary offset rows — structure dict is already scanned
        else:
            contents.append(_inflate(head, payload, raw))
    full_structure = b"\n".join(structure)
    # re-check /Encrypt on the FULL structure (an encryption dict
    # referenced from inside an ObjStm — in real encrypted files the
    # streams are ciphertext and fail inflation first, but a hostile
    # plaintext file must still poison-pill, self-review r12)
    if b"/Encrypt" in full_structure:
        raise ValueError("encrypted PDF not supported")
    if b"/Type0" in full_structure or b"/CIDFont" in full_structure:
        raise ValueError("composite (Type0/CID) fonts not supported")
    texts = [_content_text(p) for p in contents if b"BT" in p]
    return "\n".join(t for t in texts if t)


_L73_ORACLE = (
    # identical template to l70's: the PDF is a pure function of
    # documents.text (12-word paragraphs), so the oracle recomputes
    # the expected extraction from the SOURCE (split on the same
    # whitespace class the builders use)
    "WITH src AS (SELECT doc_id, "
    "regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+') AS ws "
    "FROM documents WHERE doc_id % 14 = 3 AND text IS NOT NULL "
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
    "SELECT doc_id, 1 AS ok, text, n_paragraphs, "
    "CAST(length(text) AS BIGINT) AS n_chars "
    "FROM ext ORDER BY doc_id"
)


@register("l73_pdf_extract", oracle=_L73_ORACLE, tags=("L73", "L5", "L7", "quality"))
def l73_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L73: PDF text extraction end-to-end — REAL PDF bytes (xref'd
    objects, FlateDecode content streams, escaped literal strings,
    built deterministically from documents.text) through the
    from-scratch parser, reduced to extracted text + structure stats.
    (doc_id // 14) % 3 rotates the document shape — compressed
    classic / raw classic / PDF 1.5 ObjStm + xref stream (VERDICT
    r11 #3) — so both decode paths AND the object-stream unpacker
    certify every run. The oracle recomputes the expectation from the
    SOURCE text (the l70 playbook), so a hash match certifies the
    whole build -> (deflate) -> locate -> (unpack) -> inflate ->
    tokenize -> unescape -> reflow path. Nasty-PDF goldens (escape
    sequences, octal, hex strings, TJ kerning, multi-stream) and
    poison pills (encryption, Type0 incl. ObjStm-hidden, unknown
    filter, truncation) are pinned in tests/test_pdf_extract.py."""

    def build_and_extract(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if not any(w for w in _WS_RE.split(r.text or "")):
                    continue  # oracle's word CTE yields no row (l70 rule)
                base = {
                    "doc_id": r.doc_id, "ok": 1, "text": None,
                    "n_paragraphs": None, "n_chars": None,
                }
                try:
                    # the %14==3 slice is all-odd ids, so the
                    # rotation keys on the slice index instead
                    shape = (r.doc_id // 14) % 3
                    payload = build_pdf(
                        r.text,
                        compress=bool(shape == 0),
                        objstm=bool(shape == 2),
                    )
                    text = extract_pdf_text(payload)
                    base.update(
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
            (F.col("doc_id") % 14 == 3)
            & F.col("text").isNotNull()
            & (F.length("text") > 0)
        )
        .select("doc_id", "text")
    )
    out = docs.mapInPandas(
        build_and_extract,
        schema="doc_id BIGINT, ok INT, text STRING, n_paragraphs BIGINT, n_chars BIGINT",
    )
    return out.orderBy("doc_id")


# Worker-side kernels reference this module's functions; register for
# by-value pickling (the standing plain-session contract). stdlib only.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
