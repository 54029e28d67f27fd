"""Real-HTML fallback extraction: script/style subtrees must never leak
into training text (the bare tag-strip failure mode), entities decode,
block structure becomes lines, malformed markup never raises."""

from azure_based_pii_redactor_spark.engine.html_text import html_to_text
from azure_based_pii_redactor_spark.engine.pipeline import extract_text


def test_script_style_head_dropped_entities_decoded():
    h = ("<html><head><title>Site Title</title><style>body{color:red}</style>"
         "<script>var secret = 'TRACKING';</script></head>"
         "<body><h1>Header</h1><p>Para with &amp; and &lt;tag&gt;.</p>"
         "<noscript>enable js</noscript></body></html>")
    out = html_to_text(h)
    assert "TRACKING" not in out and "color:red" not in out
    assert "enable js" not in out
    assert "Site Title" not in out  # head chrome is not document text
    assert "Para with & and <tag>." in out
    assert out.splitlines()[0] == "Header"


def test_unclosed_skip_subtrees_cannot_swallow_the_page():
    # unclosed <svg>: an HTML block tag breaks out (foreign content)
    out = html_to_text("<p>before</p><svg><circle/>junk<p>AFTER</p>")
    assert out.splitlines() == ["before", "", "AFTER"]
    # unclosed <head>/<title>: <body> clears pending skips
    out = html_to_text("<head><title>T<body><p>content</p>")
    assert out == "content"
    # unclosed <noscript> ends at </body>
    out = html_to_text("<body><noscript>x</body><p>tail</p>")
    assert "tail" in out and "x" not in out


def test_table_cells_do_not_fuse():
    out = html_to_text(
        "<table><tr><td>Name</td><td>Email</td></tr>"
        "<tr><td>Bob</td><td>b@x.com</td></tr></table>")
    assert out.splitlines() == ["Name Email", "Bob b@x.com"]


def test_block_structure_becomes_lines():
    out = html_to_text("<div>a</div><p>b</p><ul><li>c</li><li>d</li></ul>"
                       "e<br>f")
    # p boundaries are PARAGRAPH breaks (blank lines); div/li/br are
    # line breaks only
    assert out.splitlines() == ["a", "", "b", "", "c", "d", "e", "f"]


def test_unclosed_head_title_cannot_swallow_flow_content():
    """HTML5 auto-closes head/title when flow content starts; pages
    missing </head> or <body> must not extract empty (they would be
    silently dropped by the word-count gate)."""
    assert html_to_text("<title>My page<p>Hello world</p>") == "Hello world"
    assert html_to_text(
        "<html><head><meta charset='utf-8'><div>hi there</div></html>"
    ) == "hi there"
    # nested: svg > title, both unclosed -- block tag pops BOTH
    out = html_to_text("<p>a</p><svg><title>junk<p>AFTER</p>")
    assert out.splitlines() == ["a", "", "AFTER"]
    # noscript/template legitimately CONTAIN block markup: no breakout
    assert "enable" not in html_to_text(
        "<body><noscript><p>enable js</p></noscript><p>real</p></body>"
    )


def test_paragraph_structure_feeds_dup_paragraph_rules():
    """The fallback extractor emits \n\n paragraph boundaries, so the
    Gopher duplicate-paragraph metrics see the same structure the
    wrapper fast path preserves."""
    from azure_based_pii_redactor_spark.quality.heuristics import (
        gopher_c4_metrics,
    )

    text = html_to_text(
        "<p>alpha beta gamma delta.</p><p>alpha beta gamma delta.</p>"
        "<p>unique closing thoughts here.</p>"
    )
    m = gopher_c4_metrics(text)
    assert m["dup_para_frac"] > 0  # duplicated paragraph is VISIBLE


def test_malformed_html_never_raises():
    for h in ("<p>unclosed <b>bold <p>next", "<<<>>>", "<script>open",
              "&bogus; &#xZZ; tail", "<a href='x", ""):
        html_to_text(h)  # must not raise


def test_extract_text_wrapper_path_unchanged():
    """The canonical-wrapper fast path is byte-identical extraction --
    html.parser must NOT touch it (dataset invariant)."""
    body = "plain text with  double spaces & <raw> kept"
    blob = f"<html><body>{body}</body></html>".encode()
    assert extract_text(blob) == body


def test_extract_text_fallback_uses_parser():
    blob = (b"<!DOCTYPE html><html><head><script>junk()</script></head>"
            b"<body><p>real content</p></body></html>")
    assert extract_text(blob) == "real content"
