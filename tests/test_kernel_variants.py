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
