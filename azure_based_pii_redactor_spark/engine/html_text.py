"""Real-HTML text extraction (stdlib html.parser) for the non-wrapper
fallback path.

The dominant corpus path never reaches this module: generated/contract
pages carry the canonical ``<html><body>...`` wrapper that the JVM fast
path (and ``extract_text``'s prefix check) strips byte-exactly.  This
extractor handles ARBITRARY crawled html -- the case a bare tag-strip
regex gets wrong by leaking ``<script>``/``<style>`` bodies (cookie
banners, analytics JS) straight into the training text:

- script/style (CDATA elements -- the parser consumes to the close tag)
  and head/title/noscript/template/svg subtrees are dropped;
- unclosed skip subtrees CANNOT swallow the rest of the page: svg is
  foreign content and head/title auto-close when flow content starts,
  so any HTML block tag breaks out of them (the HTML5 rules); a
  ``<body>`` start or ``</body>``/``</html>`` end clears all pending
  skips.  noscript/template legitimately CONTAIN block content, so
  they do not break out -- they end at their close tag or </body>;
- character/entity references decode (convert_charrefs);
- block-level boundaries (div, li, br, table cells ...) become
  newlines/spaces so the C4 line rules still see line structure and
  adjacent table cells don't fuse into one token; PARAGRAPH-level
  boundaries (p, headings, blockquote, pre) become BLANK lines so the
  Gopher duplicate-paragraph rules (which split on \n\n) see the
  same paragraph structure the wrapper fast path preserves;
- runs of spaces/tabs collapse; blank-line RUNS collapse to one;
- malformed markup never raises (html.parser is a tolerant
  state machine by design).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# subtrees whose TEXT is dropped; script/style are CDATA (reliable close),
# the rest are ordinary elements guarded by the breakout rules above
_SKIP_SUBTREES = frozenset(
    {"script", "style", "noscript", "template", "svg", "head", "title"}
)
_BLOCK_TAGS = frozenset(
    "p div li ul ol br h1 h2 h3 h4 h5 h6 tr table blockquote pre "
    "article section header footer hr caption".split()
)
# paragraph-level subset: boundaries become BLANK lines (\n\n), the
# unit the Gopher dup-paragraph rules split on.  An explicit sentinel
# (not a literal "\n\n") marks them so adjacent BLOCK boundaries
# (</tr><tr>, </li><li>) cannot masquerade as paragraph breaks.
_PARA_TAGS = frozenset("p h1 h2 h3 h4 h5 h6 blockquote pre".split())
_PARA_BREAK = "\n\x00\n"
# subtrees a flow/block tag breaks out of when unclosed (HTML5: head and
# title auto-close at flow content; svg is foreign content) -- NOT
# noscript/template, which legitimately contain block markup
_FLOW_BREAKOUT = frozenset({"svg", "head", "title"})
# cell boundaries become SPACES (cells are fields of one line, not lines)
_CELL_TAGS = frozenset({"td", "th", "dt", "dd"})
_SPACE_RUN = re.compile(r"[ \t\r\f\v]+")


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._chunks: list[str] = []
        self._skips: list[str] = []  # stack of open skip-subtree tags

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skips.append(tag)
            return
        if tag == "body":
            # browsers auto-close head (and anything dangling in it)
            # when body starts
            self._skips.clear()
        if tag in _BLOCK_TAGS or tag in _CELL_TAGS:
            # HTML5 breakout: a block tag ends unclosed svg (foreign
            # content) and head/title (flow content auto-closes head)
            # instead of nesting inside them
            while self._skips and self._skips[-1] in _FLOW_BREAKOUT:
                self._skips.pop()
            self._chunks.append(
                _PARA_BREAK if tag in _PARA_TAGS
                else "\n" if tag in _BLOCK_TAGS else " "
            )

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES:
            if tag in self._skips:
                # pop up to and including the nearest matching open
                while self._skips:
                    if self._skips.pop() == tag:
                        break
        elif tag in ("body", "html"):
            # nothing legitimately skippable spans past </body>
            self._skips.clear()
        elif tag in _PARA_TAGS:
            self._chunks.append(_PARA_BREAK)
        elif tag in _BLOCK_TAGS:
            self._chunks.append("\n")
        elif tag in _CELL_TAGS:
            self._chunks.append(" ")

    def handle_data(self, data):
        if not self._skips and data:
            # NUL is the internal paragraph-break sentinel; real text
            # never legitimately contains it
            self._chunks.append(data.replace("\x00", ""))

    def text(self) -> str:
        raw = _SPACE_RUN.sub(" ", "".join(self._chunks))
        lines = [ln.strip() for ln in raw.split("\n")]
        out: list[str] = []
        for ln in lines:
            if ln == "\x00":  # paragraph-break sentinel line
                if out and out[-1] != "":
                    out.append("")  # one blank line per break RUN
            elif ln:
                out.append(ln)
        while out and out[-1] == "":
            out.pop()
        return "\n".join(out)


def html_to_text(html: str) -> str:
    """Extract readable text from arbitrary html (see module docstring).
    Never raises on malformed input."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    return p.text()
