"""Real-HTML text extraction (stdlib html.parser) for the non-wrapper
fallback path.

The dominant corpus path never reaches this module: generated/contract
pages carry the canonical ``<html><body>...`` wrapper that the JVM fast
path (and ``extract_text``'s prefix check) strips byte-exactly.  This
extractor handles ARBITRARY crawled html -- the case a bare tag-strip
regex gets wrong by leaking ``<script>``/``<style>`` bodies (cookie
banners, analytics JS) straight into the training text:

- script/style/noscript/template/svg subtrees are dropped entirely;
- character/entity references decode (convert_charrefs);
- block-level boundaries (p, div, li, br, headings, table rows ...)
  become newlines so the C4 line-level rules still see line structure;
- runs of spaces/tabs collapse; blank-line runs collapse to one;
- malformed markup never raises (html.parser is a tolerant
  state machine by design).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_SKIP_SUBTREES = frozenset(
    {"script", "style", "noscript", "template", "svg"}
)
_BLOCK_TAGS = frozenset(
    "p div li ul ol br h1 h2 h3 h4 h5 h6 tr table blockquote pre "
    "article section header footer hr".split()
)
_SPACE_RUN = re.compile(r"[ \t\r\f\v]+")
_NL_RUN = re.compile(r"\n\s*\n\s*")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            if self._skip_depth:
                self._skip_depth -= 1
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_data(self, data):
        if not self._skip_depth and data:
            self._chunks.append(data)

    def text(self) -> str:
        raw = "".join(self._chunks)
        raw = _SPACE_RUN.sub(" ", raw)
        raw = _NL_RUN.sub("\n", raw)
        lines = [ln.strip() for ln in raw.split("\n")]
        return "\n".join(ln for ln in lines if ln)


def html_to_text(html: str) -> str:
    """Extract readable text from arbitrary html (see module docstring).
    Never raises on malformed input."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()
