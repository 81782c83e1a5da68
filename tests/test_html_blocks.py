"""Kernel unit tests — block segmentation + boilerplate classification
(SURVEY.md §5: pure-pandas/stdlib tests runnable without Spark)."""

from invoice_extraction_spark.functions.html_blocks import extract_text, parse_blocks

PAGE = b"""<!DOCTYPE html><html><head><title>T</title><script>x=1</script></head>
<body>
<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">Shop</a></li></ul></nav>
<main><article>
<h2>Big Tractor Sale</h2>
<p>This is the main article body with plenty of informative words inside.</p>
<p><b>Total:</b> \xe2\x82\xb9830,000</p>
<p><a href="/x">link</a> <a href="/y">link</a> <a href="/z">link</a></p>
</article></main>
<footer><p><a href="/t">terms</a> <a href="/p">privacy</a></p></footer>
</body></html>"""


def test_blocks_document_order_and_regions():
    blocks = parse_blocks(PAGE)
    texts = [b.text for b in blocks]
    assert texts.index("Big Tractor Sale") < texts.index(
        "This is the main article body with plenty of informative words inside."
    )
    by_text = {b.text: b for b in blocks}
    assert by_text["T"].region == "head"
    assert by_text["Home"].region == "boiler"  # nav
    assert by_text["Big Tractor Sale"].region == "body"
    assert [b.idx for b in blocks] == sorted(b.idx for b in blocks)


def test_content_classification():
    blocks = parse_blocks(PAGE)
    by_text = {b.text: b for b in blocks}
    assert by_text["This is the main article body with plenty of informative words inside."].is_content
    assert by_text["Total: ₹830,000"].is_content  # short key-value line kept
    assert not by_text["Home"].is_content  # nav boilerplate
    assert not by_text["link link link"].is_content  # pure-link block
    assert not by_text["terms privacy"].is_content  # footer


def test_extract_text_contract():
    text = extract_text(PAGE)
    assert text == (
        "Big Tractor Sale\n"
        "This is the main article body with plenty of informative words inside.\n"
        "Total: ₹830,000"
    )


def test_link_density():
    blocks = parse_blocks(PAGE)
    by_text = {b.text: b for b in blocks}
    assert by_text["link link link"].link_density > 0.8
    assert by_text["Total: ₹830,000"].link_density == 0.0


def test_whitespace_collapse_and_nfc():
    html = b"<html><body><p>a\n\n   b\tc</p></body></html>"
    assert extract_text(html) == "a b c"


def test_malformed_html_degrades_gracefully():
    html = b"<html><body><p>unclosed paragraph <div>nested <b>bold"
    text = extract_text(html)
    assert "unclosed paragraph" in text
    assert "nested bold" in text


def test_empty_and_garbage_inputs():
    assert extract_text(b"") == ""
    assert extract_text(b"\xff\xfe\x00garbage") == ""
    assert extract_text(b"plain text no tags at all here") == ""  # no block tags -> no body blocks


def test_fallback_when_no_content_blocks():
    # everything is link-heavy -> fallback to all body blocks
    html = b'<html><body><p><a href="/x">only a link</a></p></body></html>'
    assert extract_text(html) == "only a link"
