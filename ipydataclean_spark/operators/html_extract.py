"""L70 — HTML main-content extraction (boilerplate stripping).

Web-crawl corpora arrive as HTML; every real pretraining pipeline
runs an extract step (trafilatura/jusText-style) before any text
operator sees a document. This module implements the core of that
step from scratch — no parser library:

- ``html_to_text``: a single-pass tag scanner that (1) drops
  comments, (2) drops ``script``/``style`` elements WITH their
  content, (3) drops the content of boilerplate containers
  (``nav``/``header``/``footer``/``aside`` — the chrome every page
  repeats), (4) breaks text at block-level tags, (5) strips remaining
  tags, (6) decodes the standard character entities (named + numeric),
  and (7) normalizes whitespace (runs collapse, lines trim, empties
  drop). Honest subset: quoted attributes (including ``>`` inside
  quotes) and case-insensitive tags are handled; CDATA and broken
  SGML exotica are out of scope and degrade to stripped text rather
  than crashing.

The registered query builds REAL HTML deterministically from
``documents.text`` (paragraphs of 12 words wrapped in the full page
chrome: head/style/nav/footer/script), runs the extractor, and
reports per-doc text + structure stats. Because the page template is
a pure function of the source text, the DuckDB oracle recomputes the
EXPECTED extraction directly from ``documents.text`` — a hash match
certifies the whole build→parse→strip→decode path, exactly the
closed-form-oracle trick the media codecs use (l9d/l9g/l9n/l9q).

Scale: one Arrow-batched pandas pass, map-only, no shuffle; cost
linear in HTML bytes. Malformed payloads yield ok=0 rows (poison
pill), never a task failure.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

#: elements whose CONTENT is dropped entirely (head covers title/meta;
#: script/style cover inline code; nav/header/footer/aside are the
#: page chrome every crawl repeats)
_DROP_CONTENT = {"head", "title", "script", "style", "nav", "header", "footer", "aside"}
#: tags that break text into separate lines
_BLOCK_TAGS = {
    "p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5",
    "h6", "tr", "table", "section", "article", "blockquote", "pre",
}

_ENTITIES = {
    "amp": "&", "lt": "<", "gt": ">", "quot": '"', "apos": "'",
    "nbsp": " ",
}


def _unescape(text: str) -> str:
    def sub(m: re.Match) -> str:
        body = m.group(1)
        if body.startswith("#x") or body.startswith("#X"):
            try:
                return chr(int(body[2:], 16))
            except ValueError:
                return m.group(0)
        if body.startswith("#"):
            try:
                return chr(int(body[1:]))
            except ValueError:
                return m.group(0)
        return _ENTITIES.get(body, m.group(0))

    return re.sub(r"&(#?[xX]?[0-9a-zA-Z]+);", sub, text)


def html_to_text(html: str) -> str:
    """HTML -> main-content text: one linear scan, no parser lib.
    Content of script/style and of boilerplate containers
    (nav/header/footer/aside) is dropped; block tags become line
    breaks; entities decode; whitespace normalizes (see module
    docstring for the honest subset)."""
    out: list[str] = []
    i, n = 0, len(html)
    skip_until: list[str] = []  # stack of container tags being dropped
    while i < n:
        c = html[i]
        if c == "<":
            if html.startswith("<!--", i):
                end = html.find("-->", i + 4)
                i = n if end < 0 else end + 3
                continue
            # scan the tag, honoring quoted attribute values
            j = i + 1
            quote = None
            while j < n:
                ch = html[j]
                if quote:
                    if ch == quote:
                        quote = None
                elif ch in "\"'":
                    quote = ch
                elif ch == ">":
                    break
                j += 1
            if j >= n:
                break  # unterminated tag: drop the tail
            tag_body = html[i + 1 : j].strip()
            i = j + 1
            closing = tag_body.startswith("/")
            name = re.split(r"[\s/>]", tag_body.lstrip("/"), maxsplit=1)[0].lower()
            if skip_until:
                # inside a dropped container: only its matching close
                # tag matters
                if closing and name == skip_until[-1]:
                    skip_until.pop()
                elif not closing and name in _DROP_CONTENT and not tag_body.endswith("/"):
                    skip_until.append(name)
                continue
            if not closing and name in _DROP_CONTENT and not tag_body.endswith("/"):
                skip_until.append(name)
                continue
            if name in _BLOCK_TAGS:
                out.append("\n")
            continue
        if skip_until:
            i += 1
            continue
        out.append(c)
        i += 1
    text = _unescape("".join(out))
    lines = [re.sub(r"[ \t\r\f\v]+", " ", ln).strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


#: words per fixture paragraph — the template constant the oracle
#: mirrors (see _L70_ORACLE)
#: charset labels a crawl pipeline actually meets, mapped to their
#: Python codec names (WHATWG Encoding-standard label aliasing,
#: honest subset) — anything else RAISES rather than garbles.
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "latin-1", "latin-1": "latin-1", "latin1": "latin-1",
    "windows-1252": "cp1252", "cp1252": "cp1252",
    "us-ascii": "ascii", "ascii": "ascii",
    "utf-16": "utf-16", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
}

_META_CHARSET_RE = re.compile(
    rb"<meta[^>]{0,200}?charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.I
)


def sniff_decode_html(data: bytes, content_type: str | None = None) -> str:
    """HTML bytes -> str via the HTML5 encoding-sniffing order
    (§13.2.3, honest subset): BOM (authoritative per the WHATWG
    Encoding standard) > transport-layer ``charset=`` parameter >
    ``<meta charset>`` prescan over the first 1024 bytes > the UTF-8
    default. STRICT decode with an allowlisted label set — unknown
    charsets and undecodable bytes RAISE (the poison-pill contract;
    a crawl page must never silently garble into the corpus)."""
    if data.startswith(b"\xef\xbb\xbf"):
        return data[3:].decode("utf-8")
    if data.startswith(b"\xff\xfe"):
        return data[2:].decode("utf-16-le")
    if data.startswith(b"\xfe\xff"):
        return data[2:].decode("utf-16-be")
    label = None
    if content_type:
        m = re.search(r"charset\s*=\s*\"?([A-Za-z0-9_.:-]+)", content_type, re.I)
        if m:
            label = m.group(1).lower()
    if label is None:
        m = _META_CHARSET_RE.search(data[:1024])
        if m:
            label = m.group(1).decode("ascii").lower()
    if label is None:
        label = "utf-8"
    enc = _CHARSET_ALIASES.get(label)
    if enc is None:
        raise ValueError(f"unsupported charset label {label!r}")
    return data.decode(enc)


_L70_PARA_WORDS = 12

#: the builder's word separator — exactly the whitespace class
#: html_to_text normalizes ([ \t\r\f\x0B] within lines + \n between),
#: mirrored verbatim in the oracle's regexp_split_to_array
_WS_RE = re.compile(r"[ \t\r\n\f\x0b]+")


def split_paragraphs(text: str) -> list[str]:
    """THE fixture reflow (one definition — round-11 review-2 #4):
    class-split words regrouped into 12-word single-spaced
    paragraphs. Shared by the l70/l74 page builders, l73's PDF
    builder, and mirrored by every oracle's SQL — ADVICE r10 #4 was
    exactly a drift bug between a private copy and its oracle."""
    words = [w for w in _WS_RE.split(text) if w]
    return [
        " ".join(words[k : k + _L70_PARA_WORDS])
        for k in range(0, len(words), _L70_PARA_WORDS)
    ]


def fixture_page(doc_id: int, text: str) -> str:
    """The deterministic page template (head/style/nav/comment/
    article/aside/footer/script chrome around entity-escaped
    paragraphs) — a pure function of (doc_id, text), so oracles
    recompute the expected extraction from source. Shared by l70
    (bare HTML) and l74 (the same page inside a WARC response
    record)."""

    def esc(s: str) -> str:
        return (
            s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;")
        )

    body = "\n".join(f"  <p>{esc(p)}</p>" for p in split_paragraphs(text))
    return (
        "<!DOCTYPE html><html><head>"
        f"<title>doc {doc_id}</title>"
        "<style>body { font: 14px serif; }</style>"
        "</head><body>"
        "<header><h1>Example Site</h1></header>"
        '<nav><ul><li><a href="/">home</a></li>'
        "<li><a href=\"/about\">about</a></li></ul></nav>"
        "<!-- tracking pixel -->"
        f'<article data-doc="{doc_id}">\n{body}\n</article>'
        "<aside>related links</aside>"
        "<footer>&copy; example.com</footer>"
        "<script>var t = '<not a tag>';</script>"
        "</body></html>"
    )

_L70_ORACLE = (
    # the template is a pure function of documents.text, so the
    # expected extraction recomputes from the SOURCE: words grouped
    # into 12-word paragraphs, single-spaced, joined by \n.
    # (generate_subscripts instead of WITH ORDINALITY — DuckDB has no
    # ordinality on FROM-clause unnest)
    # The split class is EXACTLY the whitespace the extractor
    # normalizes — [ \t\r\n\f\x0B] — matching the builder's re.split,
    # so a source word containing a tab/CR/FF cannot make the kernel
    # and oracle diverge (ADVICE r10 #4); \x0B not \v per the l34
    # RE2-class rule.
    "WITH src AS (SELECT doc_id, "
    "regexp_split_to_array(text, '[ \\t\\r\\n\\f\\x0B]+') AS ws "
    "FROM documents WHERE doc_id % 13 = 4 AND text IS NOT NULL "
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


@register("l70_html_extract", oracle=_L70_ORACLE, tags=("L70", "L5", "L7", "quality"))
def l70_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L70: HTML main-content extraction end-to-end — REAL page bytes
    (head/style/nav/footer/script chrome around entity-escaped
    paragraph content, built deterministically from documents.text)
    through the from-scratch tag scanner, reduced to extracted text +
    structure stats. The oracle recomputes the expectation from the
    SOURCE text, so a hash match certifies that the extractor drops
    every byte of chrome and returns every byte of content —
    including the entity round-trip (the builder escapes &<>\" and the
    extractor decodes them back). Nasty-HTML goldens (nested dropped
    containers, '>' inside quoted attributes, comments, numeric
    entities, unterminated tags) are pinned in
    tests/test_html_extract.py."""

    page = fixture_page  # closure-bound (by-value module)

    def build_and_extract(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for r in pdf.itertuples():
                if not any(w for w in _WS_RE.split(r.text or "")):
                    # all-whitespace text builds an empty page; the
                    # oracle's word CTE yields no row for it — skip to
                    # keep row sets identical (the l71 convention)
                    continue
                base = {
                    "doc_id": r.doc_id, "ok": 1, "text": None,
                    "n_paragraphs": None, "n_chars": None,
                }
                try:
                    text = html_to_text(page(int(r.doc_id), r.text))
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
            (F.col("doc_id") % 13 == 4)
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


# Worker-side kernels reference html_to_text; register for by-value
# pickling (the standing plain-session contract). Pure stdlib.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
