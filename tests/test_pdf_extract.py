"""Pins for L73 PDF text extraction (operators/pdf_extract.py).

The driver oracle hash-certifies the query end-to-end; these pin the
parser paths the template never emits (hex strings, TJ kerning
arrays, octal escapes, multi-stream pages, ' and \" operators) and
the poison pills.
"""

import re

import numpy as np
import pytest

from ipydataclean_spark.operators.pdf_extract import (
    _content_text,
    build_pdf,
    extract_pdf_text,
    l73_pdf_extract,
)


def _expected(text, k=12):
    words = text.split()
    return "\n".join(
        " ".join(words[i : i + k]) for i in range(0, len(words), k)
    )


def test_roundtrip_random_texts():
    rng = np.random.RandomState(7)
    vocab = ["spark", "table", "(paren)", "a\\b", "x)y", "word", "q1"]
    for trial in range(20):
        text = " ".join(
            vocab[rng.randint(len(vocab))] for _ in range(rng.randint(1, 80))
        )
        for compress in (True, False):
            got = extract_pdf_text(build_pdf(text, compress=compress))
            assert got == _expected(text), (trial, compress)


def test_content_stream_vectors():
    """Hand-built content streams pin operators the builder never
    emits — decoder correctness independent of our builder (the JPEG
    hand-vector rule)."""
    cases = [
        # TJ array: strings concatenated, kerning <= -180 = word space
        (b"BT [(Hel) -50 (lo) -250 (world)] TJ ET", "Hello world"),
        # hex strings (odd digit -> trailing 0: 0x40 = '@')
        (b"BT <48656C6C6F> Tj ( ) Tj <4> Tj ET", "Hello @"),
        # ' moves to next line then shows; " takes two numbers first
        (b"BT (one) Tj (two) ' 3 4 (three) \" ET", "one\ntwo\nthree"),
        # octal escapes incl. 3-digit and 1-digit forms
        (rb"BT (\101\102\103 \77) Tj ET", "ABC ?"),
        # Td/TD break lines; names and dicts are skipped
        (b"BT /F1 12 Tf (a) Tj 0 -14 Td (b) Tj 10 20 TD (c) Tj ET", "a\nb\nc"),
        # escaped newline continuation inside a literal
        (b"BT (long\\\nline) Tj ET", "longline"),
    ]
    for content, want in cases:
        assert _content_text(content) == want, content


def test_multiple_content_streams_concatenate():
    """Two page streams join with a newline (document order)."""
    one = build_pdf("first page words here", compress=True)
    # graft a second uncompressed stream object before the xref
    extra = (
        b"9 0 obj\n<< /Length 16 >>\nstream\nBT (again) Tj ET\nendstream\nendobj\n"
    )
    at = one.find(b"xref")
    grafted = one[:at] + extra + one[at:]
    got = extract_pdf_text(grafted)
    assert got == "first page words here\nagain"


def test_poison_pills():
    good = build_pdf("hello world")
    with pytest.raises(ValueError, match="PDF header"):
        extract_pdf_text(b"NOTAPDF")
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(good.replace(b"/Root", b"/Encrypt 9 0 R /Root"))
    with pytest.raises(ValueError, match="Type0"):
        extract_pdf_text(good.replace(b"/Type1", b"/Type0"))
    with pytest.raises(ValueError, match="filter"):
        extract_pdf_text(good.replace(b"/FlateDecode", b"/LZWDecode00"))
    # corrupt deflate payload: flip bytes inside the stream
    data = bytearray(good)
    s = data.find(b"stream\n") + 7
    data[s : s + 4] = b"\x00\x00\x00\x00"
    with pytest.raises(ValueError, match="FlateDecode"):
        extract_pdf_text(bytes(data))
    with pytest.raises(ValueError, match="unterminated"):
        _content_text(b"BT (never closed Tj ET")


def test_fuzz_never_hangs():
    """Byte-mutation fuzz: extract returns text or raises, promptly."""
    base = bytearray(build_pdf(" ".join(f"w{i}" for i in range(40))))
    rng = np.random.RandomState(42)
    ok = raised = 0
    for _ in range(200):
        mut = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randint(0, len(mut))] = rng.randint(0, 256)
        try:
            out = extract_pdf_text(bytes(mut))
            assert isinstance(out, str)
            ok += 1
        except Exception:
            raised += 1
    assert ok + raised == 200
    assert raised > 0


def test_l73_query_nonvacuous(spark, sf_dir):
    rows = l73_pdf_extract(spark, sf_dir).collect()
    assert rows and all(r.ok == 1 for r in rows)
    # all three document shapes present: compressed classic / raw
    # classic / PDF 1.5 ObjStm + xref stream (VERDICT r11 #3)
    assert {(r.doc_id // 14) % 3 for r in rows} == {0, 1, 2}
    assert all(r.n_chars == len(r.text) for r in rows)


def test_third_party_readability_xref_offsets():
    """The builder's xref must carry CORRECT byte offsets — the part
    a lenient scan-based parser (ours) never checks but a conformant
    reader requires."""
    data = build_pdf("check the xref table words")
    at = data.find(b"xref")
    lines = data[at:].split(b"\n")
    n = int(lines[1].split()[1])
    for i in range(1, n):  # entry 0 is the free head
        off = int(lines[2 + i].split()[0])
        assert data[off:].startswith(f"{i} 0 obj".encode()), i
    startxref = int(data[data.rfind(b"startxref") + 10 :].split()[0])
    assert data[startxref:].startswith(b"xref")


def test_structural_poison_pills_ignore_stream_content():
    """Review-2 #1: a document whose TEXT mentions /Type0 or /Encrypt
    must extract fine in both raw and compressed streams — the
    poison-pill scan covers the structure only."""
    text = "see section /Type0 and /Encrypt handling notes " + " ".join(
        f"w{i}" for i in range(10)
    )
    for compress in (True, False):
        got = extract_pdf_text(build_pdf(text, compress=compress))
        assert got == _expected(text), compress


def test_indirect_length_falls_back_to_scan():
    """Review-2 #2 + ADVICE r11 #1: the common '/Length N 0 R'
    indirect form must not be misread as a direct length (which
    silently sliced a short payload) — including MULTI-digit object
    numbers, where regex backtracking used to defeat the lookahead
    ((\\d+) retreated to '1' in '/Length 12 0 R' and sliced a 1-byte
    payload); the endstream scan recovers the full text."""
    for ref in (b"/Length 6 0 R", b"/Length 12 0 R", b"/Length 907 12 R"):
        data = build_pdf("indirect length object words here", compress=False)
        at = data.find(b"/Length ")
        sp = data.find(b" ", at + 8)
        mutated = data[:at] + ref + data[sp:]
        assert extract_pdf_text(mutated) == _expected(
            "indirect length object words here"
        ), ref


def _flate_content_ending_in_eol():
    """A content stream whose zlib bytes end in an EOL byte — the
    payload the endstream scan can truncate. The zlib stream ends
    with the big-endian adler32, whose low byte is (1 + sum(content))
    mod 65521 & 0xFF for short inputs — so pad the literal string
    with \\x01 bytes until that byte is exactly 0x0A."""
    import zlib

    base, tail = b"BT (eol case ok", b") Tj ET"
    k = (9 - sum(base + tail)) % 256
    content = base + b"\x01" * k + tail
    z = zlib.compress(content)
    assert z.endswith(b"\n"), z[-1]
    return _content_text(content), z


def _wrap_stream_obj(obj):
    return b"%PDF-1.4\n7 0 obj\n" + obj + b"\nendobj\n%%EOF\n"


def test_endstream_scan_strips_at_most_one_eol():
    """ADVICE r11 #2: Flate data ending in 0x0A, conforming writer
    EOL before 'endstream', indirect /Length (scan path) — the old
    blanket rstrip removed BOTH bytes and raised 'corrupt FlateDecode
    stream' on a valid file; one-EOL strip recovers it exactly."""
    want, z = _flate_content_ending_in_eol()
    obj = (
        b"<< /Length 99 0 R /Filter /FlateDecode >>\nstream\n"
        + z + b"\nendstream"
    )
    assert extract_pdf_text(_wrap_stream_obj(obj)) == want


def test_endstream_scan_retries_unstripped_flate():
    """A nonconforming writer that omits the EOL before 'endstream'
    while the Flate data ends in an EOL byte: the one-EOL strip takes
    a data byte, and the decompressobj retry on the raw slice must
    recover the stream."""
    want, z = _flate_content_ending_in_eol()
    obj = b"<< /Length 99 0 R /Filter /FlateDecode >>\nstream\n" + z + b"endstream"
    assert extract_pdf_text(_wrap_stream_obj(obj)) == want


# --- PDF 1.5 object streams / xref streams (VERDICT r11 #3) ---


def _objstm_doc(text="object stream words packed in a compressed container"):
    return build_pdf(text, objstm=True)


def test_objstm_roundtrip_random_texts():
    """The PDF 1.5 shape (dicts in a compressed ObjStm, xref as a
    /Type/XRef stream, NO classic table) extracts identically."""
    rng = np.random.RandomState(11)
    vocab = ["spark", "table", "(paren)", "a\\b", "x)y", "word", "q1"]
    for trial in range(10):
        text = " ".join(
            vocab[rng.randint(len(vocab))] for _ in range(rng.randint(1, 80))
        )
        data = build_pdf(text, objstm=True)
        assert b"\nxref\n" not in data and b"trailer" not in data
        assert b"/Type /ObjStm" in data and b"/Type /XRef" in data
        assert extract_pdf_text(data) == _expected(text), trial


def test_objstm_xref_stream_offsets_and_rows():
    """Third-party readability of the 1.5 shape: the /W [1 4 2] rows
    must carry correct types and byte offsets (type 1) / ObjStm
    indexes (type 2), and startxref must point at obj 7."""
    import struct
    import zlib

    data = _objstm_doc()
    startxref = int(data[data.rfind(b"startxref") + 10 :].split()[0])
    assert data[startxref:].startswith(b"7 0 obj")
    m = re.search(rb"7 0 obj\n<<[^>]*>>\nstream\n", data[startxref:])
    head = data[startxref : startxref + m.end()]
    ln = int(re.search(rb"/Length (\d+)", head).group(1))
    rows = zlib.decompress(data[startxref + m.end() : startxref + m.end() + ln])
    assert len(rows) == 8 * 7
    ent = [struct.unpack(">BIH", rows[i * 7 : i * 7 + 7]) for i in range(8)]
    assert ent[0] == (0, 0, 0xFFFF)
    for num in (1, 2, 3, 5):  # packed into the ObjStm (obj 6)
        t, f2, f3 = ent[num]
        assert (t, f2) == (2, 6)
    for num in (4, 6):  # top-level: offset points at "num 0 obj"
        t, off, _ = ent[num]
        assert t == 1 and data[off:].startswith(f"{num} 0 obj".encode())
    assert ent[7][0] == 1 and ent[7][1] == startxref


def _mutate_objstm(data, fn):
    """Inflate obj 6's ObjStm payload, run fn(plain)->plain', splice
    back with a corrected /Length."""
    import zlib

    at = data.find(b"6 0 obj\n")
    m = re.search(rb"stream\r?\n", data[at:])
    head_end = at + m.end()
    ln = int(re.search(rb"/Length (\d+)", data[at:head_end]).group(1))
    plain = zlib.decompress(data[head_end : head_end + ln])
    new = zlib.compress(fn(plain))
    head = data[at:head_end].replace(
        b"/Length " + str(ln).encode(), b"/Length " + str(len(new)).encode()
    )
    return data[:at] + head + new + data[head_end + ln :]


def test_objstm_hidden_type0_still_poisons():
    """The r11 gap: a /Type0 font packed inside a COMPRESSED ObjStm
    was invisible to the structural scan. Now the unpacked bodies
    join the scan and the poison-pill fires."""
    data = _mutate_objstm(
        _objstm_doc(), lambda p: p.replace(b"/Subtype /Type1", b"/Subtype /Type0")
    )
    with pytest.raises(ValueError, match="Type0"):
        extract_pdf_text(data)


def test_objstm_malformed_raises():
    """ObjStm header/table damage RAISES — never a silent empty
    extraction (the r11 'extract as empty' failure mode)."""
    good = _objstm_doc()
    with pytest.raises(ValueError, match="/First beyond"):
        extract_pdf_text(
            good.replace(b" /First ", b" /First 99999 %", 1)
        )
    with pytest.raises(ValueError, match="pair table"):
        # lop one pair off the table: /N still promises 4
        extract_pdf_text(
            _mutate_objstm(good, lambda p: p.replace(b"1 0 ", b"", 1))
        )
    with pytest.raises(ValueError, match="ObjStm"):
        extract_pdf_text(
            _mutate_objstm(good, lambda p: p.replace(b"1 0 ", b"x y ", 1))
        )


def test_xref_stream_payload_never_parsed_as_content():
    """A cross-reference stream's binary rows can contain 'BT' by
    chance — the /Type/XRef classification must keep them out of the
    content walk (and out of the extracted text)."""
    fake_rows = b"BT (sneaky xref text) Tj ET"
    obj = (
        b"9 0 obj\n<< /Type /XRef /Size 1 /W [1 4 2] /Root 1 0 R /Length "
        + str(len(fake_rows)).encode()
        + b" >>\nstream\n" + fake_rows + b"\nendstream\nendobj\n"
    )
    base = build_pdf("real words only here please", compress=False)
    at = base.rfind(b"xref\n")
    data = base[:at] + obj + base[at:]
    out = extract_pdf_text(data)
    assert "sneaky" not in out
    assert out == _expected("real words only here please")


def test_hybrid_xrefstm_trailer_extracts():
    """Hybrid-reference files (classic xref + /XRefStm trailer key
    pointing at a cross-reference stream, ISO 32000-1 §7.5.8.4 — the
    Acrobat-compat shape) must extract normally: the structural walk
    doesn't consume xref offsets, and the /Type/XRef stream payload
    stays out of the content path."""
    import zlib as _z

    base = build_pdf("hybrid reference table words here", compress=False)
    rows = _z.compress(b"\x01" * 14)
    xr = (
        b"8 0 obj\n<< /Type /XRef /Size 2 /W [1 4 2] /Root 1 0 R /Length "
        + str(len(rows)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + rows
        + b"\nendstream\nendobj\n"
    )
    at = base.find(b"xref\n")
    data = base[:at] + xr + base[at:]
    data = data.replace(b"/Root 1 0 R >>", b"/Root 1 0 R /XRefStm 20 >>")
    assert extract_pdf_text(data) == _expected("hybrid reference table words here")


def test_objstm_hidden_encrypt_still_poisons():
    """Self-review r12: /Encrypt referenced from INSIDE an ObjStm (a
    hostile plaintext file — real encrypted files fail inflation
    first) must still poison-pill via the full-structure re-check."""
    data = _mutate_objstm(
        _objstm_doc(),
        lambda p: p.replace(b"/Type /Catalog", b"/Type /Catalog /Encrypt 9 0 R"),
    )
    with pytest.raises(ValueError, match="encrypted"):
        extract_pdf_text(data)


def test_objstm_fuzz_never_hangs():
    """Byte-mutation fuzz over the PDF 1.5 shape: the ObjStm/XRef
    parse loops must return text or raise, promptly."""
    base = bytearray(build_pdf(" ".join(f"w{i}" for i in range(40)), objstm=True))
    rng = np.random.RandomState(77)
    ok = raised = 0
    for _ in range(150):
        mut = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randint(0, len(mut))] = rng.randint(0, 256)
        try:
            out = extract_pdf_text(bytes(mut))
            assert isinstance(out, str)
            ok += 1
        except Exception:
            raised += 1
    assert ok + raised == 150
    assert raised > 0
