"""HTML→text extractor determinism contract (BASELINE.json:15:
byte-identical extracted text per url; idempotence)."""

from spinneret_spark.extract.htmltext import extract_text


HTML = b"""<!doctype html>
<html><head><title>Ignored Title Context</title>
<style>body { color: red }</style>
<script>var x = "boilerplate";</script></head>
<body>
<nav><a href="/">home</a><a href="/about">about</a></nav>
<header>Site header junk</header>
<main>
<h1>Ocean   acidification</h1>
<p>Kelp forests &amp; sea   water temperature records.</p>
<div>Second  block
spanning lines.</div>
</main>
<footer>copyright 2024</footer>
</body></html>"""

EXPECTED = (
    "Ocean acidification\n"
    "Kelp forests & sea water temperature records.\n"
    "Second block\n"  # newline in source text = hard break (rule 4b)
    "spanning lines."
)


def test_extracts_main_content_only():
    assert extract_text(HTML) == EXPECTED


def test_drops_script_style_nav_header_footer():
    text = extract_text(HTML)
    for junk in ["boilerplate", "home", "header junk", "copyright", "color: red"]:
        assert junk not in text


def test_byte_identical_across_calls():
    assert extract_text(HTML).encode() == extract_text(HTML).encode()


def test_idempotent():
    once = extract_text(HTML)
    assert extract_text(once) == once


def test_accepts_str_and_bytes():
    assert extract_text(HTML.decode()) == extract_text(HTML)


def test_entity_decoding():
    assert extract_text(b"<p>a &lt; b &amp;&amp; c &gt; d</p>") == "a < b && c > d"


def test_invalid_utf8_is_deterministic():
    bad = b"<p>caf\xff\xfe</p>"
    assert extract_text(bad) == extract_text(bad)


def test_empty_and_tagless():
    assert extract_text(b"") == ""
    assert extract_text(b"plain  text   only") == "plain text only"
