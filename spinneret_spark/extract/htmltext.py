"""Deterministic HTML → main-text extraction (stdlib only).

Role: the "trafilatura-equivalent" extraction stage mandated by the
north rule (BASELINE.json:6). The binding contract is the per-row
invariant (BASELINE.json:15): **byte-identical extracted text per
url** against the corpus's ``text`` column, run after run, partition
layout notwithstanding. That demands a fully deterministic, versioned
rule set — no heuristics that depend on float scoring or dict order.

Rules (v1, frozen — bump EXTRACTOR_VERSION on any change so lineage
rows can attribute outputs to an extractor version):

1. Parse with ``html.parser`` (tolerant, no recovery ambiguity for
   the inputs we generate; real-world tag soup degrades gracefully).
2. Drop entire subtrees of non-content elements: script, style,
   noscript, template, head, nav, header, footer, aside, form,
   iframe, svg, button, select, option, label.
3. Character/entity references decoded (convert_charrefs).
4. Text nodes are whitespace-collapsed; consecutive inline text is
   joined with single spaces. (4b) Newlines inside text nodes are
   hard line breaks — this makes the extractor idempotent.
5. Block-level boundaries (p, div, br, li, h1-h6, tr, table, ul, ol,
   section, article, main, blockquote, pre, body) flush the current
   line; output is non-empty lines joined by "\n".

Non-HTML XML (e.g. the EML metadata documents) passes through rule
2-5 unharmed: every element is unknown → treated as block=False,
inline text concatenated; EML docs are routed to the workbook
extractor by content sniffing upstream, not here.
"""

from __future__ import annotations

from html.parser import HTMLParser

EXTRACTOR_VERSION = "htmltext-v1"

_DROP_TAGS = frozenset(
    [
        "script",
        "style",
        "noscript",
        "template",
        "head",
        "nav",
        "header",
        "footer",
        "aside",
        "form",
        "iframe",
        "svg",
        "button",
        "select",
        "option",
        "label",
    ]
)

_BLOCK_TAGS = frozenset(
    [
        "p",
        "div",
        "br",
        "li",
        "h1",
        "h2",
        "h3",
        "h4",
        "h5",
        "h6",
        "tr",
        "table",
        "ul",
        "ol",
        "section",
        "article",
        "main",
        "blockquote",
        "pre",
        "body",
        "title",
    ]
)

_VOID_TAGS = frozenset(["br", "hr", "img", "input", "meta", "link"])


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._drop_depth = 0
        self._parts: list[str] = []  # current line fragments
        self._lines: list[str] = []

    def _flush(self) -> None:
        if self._parts:
            line = " ".join(self._parts)
            if line:
                self._lines.append(line)
            self._parts = []

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS and tag not in _VOID_TAGS:
            self._drop_depth += 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS and tag not in _VOID_TAGS:
            if self._drop_depth > 0:
                self._drop_depth -= 1
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        # Newlines in source text are hard line breaks (rule 4b). This
        # makes extraction idempotent: extract(extract(x)) == extract(x),
        # because output lines re-parse to the same lines.
        for i, segment in enumerate(data.split("\n")):
            if i > 0:
                self._flush()
            collapsed = " ".join(segment.split())
            if collapsed:
                self._parts.append(collapsed)

    def result(self) -> str:
        self._flush()
        return "\n".join(self._lines)


def extract_text(html: bytes | str) -> str:
    """Extract main text from one HTML document, deterministically.

    Accepts bytes (decoded utf-8, errors replaced — replacement is
    itself deterministic) or str. Idempotent: extract(extract(x))
    == extract(x) because plain text contains no tags and whitespace
    is already normalized.
    """
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _TextExtractor()
    parser.feed(html)
    parser.close()
    return parser.result()
