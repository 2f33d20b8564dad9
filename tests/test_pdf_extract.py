"""Pins for L73 PDF text extraction (operators/pdf_extract.py).

The driver oracle hash-certifies the query end-to-end; these pin the
parser paths the template never emits (hex strings, TJ kerning
arrays, octal escapes, multi-stream pages, ' and \" operators) and
the poison pills.
"""

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
    # both compressed and raw stream paths present
    assert {(r.doc_id // 14) % 2 for r in rows} == {0, 1}
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
