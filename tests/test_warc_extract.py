"""Pins for L74 WARC ingestion (operators/warc_extract.py).

The driver oracle hash-certifies the chained query; these pin the
container mechanics the oracle can't isolate — gzip member splitting,
record framing, type filtering, envelope stripping — plus poison
pills and fuzz.
"""

import numpy as np
import pytest

from ipydataclean_spark.operators.warc_extract import (
    build_warc,
    http_response,
    iter_warc_records,
    l74_warc_extract,
)


def _three_record_archive(compress):
    return build_warc(
        [
            ("response", "https://a.example/x", http_response(b"<p>hello</p>")),
            ("metadata", "https://a.example/x", b"fetch-ms: 9"),
            ("response", "https://a.example/y", http_response(b"<p>bye</p>")),
        ],
        compress=compress,
    )


@pytest.mark.parametrize("compress", [True, False])
def test_record_iteration_and_envelope_strip(compress):
    recs = iter_warc_records(_three_record_archive(compress))
    assert [r["type"] for r in recs] == ["response", "metadata", "response"]
    assert recs[0]["body"] == b"<p>hello</p>"  # HTTP envelope stripped
    assert recs[0]["http_status"] == "HTTP/1.1 200 OK"
    assert recs[1]["body"] == b"fetch-ms: 9"  # non-response kept raw
    assert recs[2]["url"] == "https://a.example/y"


def test_gzip_members_are_independent():
    """The .warc.gz contract that makes WARC splittable: each record
    is its own gzip member, so any member decompresses alone."""
    data = _three_record_archive(True)
    # locate member boundaries by the gzip magic
    starts = [i for i in range(len(data) - 1) if data[i : i + 2] == b"\x1f\x8b"]
    assert len(starts) == 3
    middle = data[starts[1] : starts[2]]
    (rec,) = iter_warc_records(middle)
    assert rec["type"] == "metadata"


def test_poison_pills():
    good = _three_record_archive(True)
    with pytest.raises(ValueError, match="gzip"):
        iter_warc_records(good[: len(good) // 2])  # truncated member
    raw = _three_record_archive(False)
    with pytest.raises(ValueError, match="version line"):
        iter_warc_records(b"NOTWARC/1.0\r\n\r\n\r\n\r\n")
    # corrupt the Content-Length digits of the raw form
    at = raw.find(b"Content-Length: ")
    bad = raw[: at + 16] + b"9999999" + raw[at + 16 :]
    with pytest.raises(ValueError, match="truncated before Content-Length"):
        iter_warc_records(bad)
    with pytest.raises(ValueError, match="trailer"):
        iter_warc_records(raw[:-2])  # missing final CRLF of the trailer
    with pytest.raises(ValueError, match="garbage between"):
        iter_warc_records(good + b"JUNK")


def test_warc_date_header_on_every_record():
    """ADVICE r11 #3: WARC-Date is MANDATORY on every record (ISO
    28500) — strict third-party tooling rejects records without it.
    Fixed deterministic instant keeps the fixture bytes stable."""
    recs = iter_warc_records(_three_record_archive(False))
    assert len(recs) == 3
    for r in recs:
        assert r["headers"]["warc-date"] == "2026-01-01T00:00:00Z"


@pytest.mark.parametrize("gzip_body", [False, True])
@pytest.mark.parametrize("chunked", [False, True])
@pytest.mark.parametrize("compress", [False, True])
def test_http_envelope_codings_roundtrip(compress, chunked, gzip_body):
    """VERDICT r11 #2: chunked de-framing and gzip entity inflation —
    every coding combination hands downstream the same entity body."""
    body = b"<p>" + b"hello coded world " * 40 + b"</p>"
    archive = build_warc(
        [
            (
                "response",
                "https://a.example/z",
                http_response(body, chunked=chunked, gzip_body=gzip_body,
                              chunk_size=37),
            )
        ],
        compress=compress,
    )
    (rec,) = iter_warc_records(archive)
    assert rec["body"] == body
    assert rec["http_status"] == "HTTP/1.1 200 OK"
    te = rec["http_headers"].get("transfer-encoding")
    assert (te == "chunked") == chunked
    assert ("content-encoding" in rec["http_headers"]) == gzip_body


def test_chunked_vectors():
    """Hand-built chunked entities pin framing details the builder
    never emits: chunk extensions, trailer fields, hex case."""
    from ipydataclean_spark.operators.warc_extract import _dechunk

    assert _dechunk(b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n") == b"Wikipedia"
    # chunk extension after ';' ignored; uppercase hex size
    assert _dechunk(b"A;name=v\r\n0123456789\r\n0\r\n\r\n") == b"0123456789"
    # trailer fields after the 0-chunk are skipped
    assert (
        _dechunk(b"3\r\nabc\r\n0\r\nExpires: never\r\nX-T: 1\r\n\r\n") == b"abc"
    )


def test_envelope_poison_pills():
    """Malformed codings RAISE — never hand garbled bytes downstream."""
    def _one(payload):
        archive = build_warc([("response", "https://a.example/p", payload)],
                             compress=False)
        return iter_warc_records(archive)

    base = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
    with pytest.raises(ValueError, match="unsupported Transfer-Encoding"):
        _one(base + b"Transfer-Encoding: gzip\r\n\r\nxx")
    with pytest.raises(ValueError, match="unsupported Content-Encoding"):
        _one(base + b"Content-Encoding: br\r\n\r\nxx")
    with pytest.raises(ValueError, match="bad chunk size"):
        _one(base + b"Transfer-Encoding: chunked\r\n\r\nZZ\r\nxx\r\n0\r\n\r\n")
    with pytest.raises(ValueError, match="chunk data"):
        _one(base + b"Transfer-Encoding: chunked\r\n\r\nFF\r\nshort")
    with pytest.raises(ValueError, match="gzip entity"):
        _one(base + b"Content-Encoding: gzip\r\n\r\nnot-gzip-bytes")
    truncated_gz = http_response(b"<p>cut</p>", gzip_body=True)[:-3]
    with pytest.raises(ValueError, match="gzip entity"):
        _one(truncated_gz)


def test_fuzz_never_hangs():
    base = bytearray(_three_record_archive(True))
    rng = np.random.RandomState(17)
    ok = raised = 0
    for _ in range(200):
        mut = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            mut[rng.randint(0, len(mut))] = rng.randint(0, 256)
        try:
            recs = iter_warc_records(bytes(mut))
            assert isinstance(recs, list)
            ok += 1
        except Exception:
            raised += 1
    assert ok + raised == 200
    assert raised > 0


def test_l74_query_nonvacuous(spark, sf_dir):
    rows = l74_warc_extract(spark, sf_dir).collect()
    assert rows and all(r.ok == 1 for r in rows)
    assert all(r.n_records == 2 for r in rows)  # metadata record seen+skipped
    assert all(r.url == f"https://example.com/doc/{r.doc_id}" for r in rows)
    # both compressed and plain archive paths present
    assert {(r.doc_id // 17) % 2 for r in rows} == {0, 1}
    # all three HTTP envelope shapes present (plain / chunked /
    # chunked+gzip — the VERDICT r11 #2 rotation)
    assert {(r.doc_id // 17) % 3 for r in rows} == {0, 1, 2}
    # all five charset shapes present (utf-8 x2 / utf-16+BOM /
    # cp1252 via meta / utf-8 via Content-Type — the round-12
    # sniffing rotation), and every one extracted ok
    assert {(r.doc_id // 17) % 5 for r in rows} == {0, 1, 2, 3, 4}
    assert all(r.ok == 1 for r in rows)
