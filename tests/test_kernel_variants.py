"""Kernel behavior on page structures OUTSIDE the synthetic corpus templates:
table-based invoices, definition lists, deeply nested boilerplate — the
shapes real Common-Crawl pages take (kept separate from goldens so the
seeded corpus stays frozen)."""

from invoice_extraction_spark.functions.fields import extract_fields
from invoice_extraction_spark.functions.html_blocks import extract_text, parse_blocks

TABLE_INVOICE = b"""<html><body>
<header><h1>MegaShop</h1><nav><a href='/'>home</a> <a href='/c'>cart</a></nav></header>
<main><table>
<tr><td>Invoice No:</td><td>INV-555666</td></tr>
<tr><td>Invoice Date:</td><td>12/11/2021</td></tr>
<tr><td>Sold By:</td><td>ROYAL MOTORS</td></tr>
<tr><td>Grand Total:</td><td>\xe2\x82\xb945,000</td></tr>
</table></main>
<footer><a href='/terms'>terms</a></footer></body></html>"""

DL_PAGE = b"""<html><body><main><article>
<h2>Order summary for your recent purchase</h2>
<dl><dt>Ship To:</dt><dd>7 Canal Road, Pune 411002</dd>
<dt>Order Date:</dt><dd>Mar 9, 2021</dd></dl>
<p>Thanks for shopping with us, your order will arrive soon.</p>
</article></main></body></html>"""

DEEP_BOILER = b"""<html><body>
<div class="wrapper"><div id="cookie-banner"><p>We use cookies to improve your experience okay</p></div>
<div class="content-area"><div><div><p>Deeply nested but genuine article content with many words here.</p>
<p>Total Amount: 98,500</p></div></div></div>
<div class="share"><a href="/fb">share</a> <a href="/tw">tweet</a></div>
</div></body></html>"""


def test_table_invoice_cells_become_blocks_and_fields_extract():
    text = extract_text(TABLE_INVOICE)
    # td value cells are kept as blocks (DATA_CELL_TAGS rule): anchor on one
    # line, value on the next; the anchored regexes cross the newline via \s*
    assert "Invoice No:" in text and "INV-555666" in text
    assert "₹45,000" in text
    f = extract_fields(text)
    assert f["invoice_id"].value == "INV-555666"
    assert f["invoice_date"].value == "12/11/2021"
    assert f["seller"].value == "ROYAL MOTORS"
    assert f["total"].value == "₹45,000"
    # spans still index into the extracted text
    assert text[f["total"].start : f["total"].end] == "₹45,000"


def test_definition_list_extraction():
    text = extract_text(DL_PAGE)
    assert "Ship To:" in text and "7 Canal Road, Pune 411002" in text
    f = extract_fields(text)
    assert f["shipping_addr"] is not None
    assert "Canal Road" in f["shipping_addr"].value
    assert f["order_date"].value == "Mar 9, 2021"


COMMENT_HEAVY = b"""<html><body><main>
<!-- rendering pipeline v2 -->
<!-- Invoice No: INV-999999 (debug) -->
<p>Genuine article text about the order confirmation process here.</p>
<!-- Total Amount: 9,999,999 -->
<p>Invoice No: INV-777888</p>
<!--[if IE]><p>Total Amount: 8,888,888</p><![endif]-->
<p>Total Amount: 55,000</p>
</main></body></html>"""

IFRAME_PAGE = b"""<html><body><main>
<p>Real page content with the actual purchase details below.</p>
<iframe src="https://ads.example.com/slot"><p>Total Amount: 7,777,777</p>
fallback text browsers never render</iframe>
<p>Total Amount: 61,500</p>
</main></body></html>"""

LINK_FARM = b"""<html><body><main>
<p>Short intro paragraph with enough words to count as content.</p>
<div><a href="/1">cheap tractors 20,000</a> <a href="/2">buy now 30,000</a>
<a href="/3">deals</a> <a href="/4">sale</a> <a href="/5">offers</a>
<a href="/6">Total Amount: 4,444,444</a> <a href="/7">more</a></div>
<p>Total Amount: 72,000</p>
</main></body></html>"""


def test_comments_never_leak_into_text():
    """Adversarial (NOTES r1): planted fields inside HTML comments — including
    IE conditional comments — must not be extracted."""
    text = extract_text(COMMENT_HEAVY)
    assert "INV-999999" not in text and "9,999,999" not in text
    assert "8,888,888" not in text
    f = extract_fields(text)
    assert f["invoice_id"].value == "INV-777888"
    assert f["total"].value == "55,000"


def test_iframe_fallback_content_is_skipped():
    """Browsers never render iframe fallback content; the kernel must not
    extract fields from it."""
    text = extract_text(IFRAME_PAGE)
    assert "7,777,777" not in text and "fallback text" not in text
    f = extract_fields(text)
    assert f["total"].value == "61,500"


def test_link_farm_is_boilerplate_by_link_density():
    """A link-farm div (dozens of anchors, no prose) must fail the
    link-density gate even when a decoy amount hides in anchor text."""
    blocks = parse_blocks(LINK_FARM)
    farm = next(b for b in blocks if "cheap tractors" in b.text)
    assert farm.link_density > 0.9
    assert not farm.is_content
    text = extract_text(LINK_FARM)
    assert "4,444,444" not in text
    f = extract_fields(text)
    assert f["total"].value == "72,000"


def test_cookie_banner_and_share_widgets_are_boilerplate():
    blocks = parse_blocks(DEEP_BOILER)
    by_text = {b.text: b for b in blocks}
    cookie = by_text["We use cookies to improve your experience okay"]
    assert cookie.region == "boiler"  # id="cookie-banner" token match
    text = extract_text(DEEP_BOILER)
    assert "cookies" not in text
    assert "share" not in text
    assert "Deeply nested but genuine article content" in text
    f = extract_fields(text)
    assert f["total"].value == "98,500"
