"""Kernel unit tests — label-anchor span extraction (reference extractors.py
candidate/argmax semantics, SURVEY.md §2.7-2.8)."""

from invoice_extraction_spark.functions.fields import (
    FIELD_NAMES,
    best_span,
    extract_fields,
    field_candidates,
)

TEXT = (
    "Big Tractor Sale\n"
    "Invoice No: INV-123456\n"
    "Invoice Date: 04/03/2021\n"
    "Order Date: Mar 1, 2021\n"
    "Sold By: SABAR AGROTECH\n"
    "Billing Address: 12 Market Road, Pune 411001\n"
    "Ship To: 9 Field Lane, Rajkot 360001\n"
    "Grand Total: ₹8,30,000"
)


def test_all_fields_extracted_with_offsets():
    f = extract_fields(TEXT)
    assert f["invoice_id"].value == "INV-123456"
    assert f["invoice_date"].value == "04/03/2021"
    assert f["order_date"].value == "Mar 1, 2021"
    assert f["seller"].value == "SABAR AGROTECH"
    assert f["billing_addr"].value == "12 Market Road, Pune 411001"
    assert f["shipping_addr"].value == "9 Field Lane, Rajkot 360001"
    assert f["total"].value == "₹8,30,000"
    # span offsets index into the text (bbox analog, detector.py:20-37)
    for name in FIELD_NAMES:
        s = f[name]
        assert TEXT[s.start : s.end] == s.value


def test_argmax_prefers_anchored_over_generic():
    text = "some ₹999,999 noise\nGrand Total: ₹830,000"
    cands = field_candidates(text, "total")
    best = best_span(cands)
    assert best.value == "₹830,000"
    assert best.method == "anchor"
    assert any(c.method == "currency" for c in cands)


def test_tie_break_earliest_start():
    text = "Grand Total: ₹10,000\nGrand Total: ₹20,000"
    assert best_span(field_candidates(text, "total")).value == "₹10,000"


def test_missing_fields_are_none():
    f = extract_fields("nothing invoice-like here at all")
    assert all(f[n] is None for n in FIELD_NAMES)


def test_anchor_without_value_not_matched():
    f = extract_fields("Invoice No:\nGrand Total:")
    assert f["invoice_id"] is None
    assert f["total"] is None


def test_lakhs_and_date_format_variants():
    f = extract_fields("Amount Payable: 8.3 Lakhs\nInvoice Date: 2021-03-04")
    assert f["total"].value == "8.3 Lakhs"
    assert f["invoice_date"].value == "2021-03-04"


def test_order_date_anchor_does_not_leak_into_invoice_date():
    f = extract_fields("Order Date: 28/12/2021")
    assert f["order_date"].value == "28/12/2021"
    assert f["invoice_date"] is None


# --- property fuzz: span offsets always index into the text --------------

from hypothesis import given, settings
from hypothesis import strategies as st

_invoiceish = st.lists(
    st.one_of(
        st.sampled_from(
            ["Invoice No: INV-123456", "Grand Total: ₹45,000", "Total: 99",
             "Sold By: ROYAL MOTORS", "Bill To: 7 Canal Rd", "Ship To: x",
             "Invoice Date: 12/11/2021", "Order Date: Mar 9, 2021",
             "random prose words", "Dated: 2021-01-02", "₹ 1,234,567"]
        ),
        st.text(alphabet="aZ 9:,.₹$-\n", min_size=0, max_size=16),
    ),
    max_size=12,
).map("\n".join)


@settings(max_examples=200, deadline=None)
@given(_invoiceish)
def test_spans_always_index_into_text(text):
    """Invariant behind the golden span contract: whatever the input, every
    returned span's [start, end) must slice the input back to its value."""
    for name, s in extract_fields(text).items():
        if s is not None:
            assert text[s.start : s.end] == s.value, (name, s)
            assert s.value.strip() == s.value


def test_first_span_equals_best_of_all_candidates():
    """first_span is the hot-path shortcut; it must equal the reference-shape
    argmax over the FULL candidate list on every corpus page and on crafted
    edge cases (empty-strip matches, multi-hit anchors, fallback-only hits)."""
    from invoice_extraction_spark.corpus import synth_pages
    from invoice_extraction_spark.functions.fields import (
        FIELD_NAMES,
        best_span,
        field_candidates,
        first_span,
    )
    from invoice_extraction_spark.functions.html_blocks import extract_text

    cases = [extract_text(p["html"]) for p in synth_pages(150)]
    cases += [
        "Invoice No: INV-123456\nTotal: 45,000\nINV-999999 later",
        "Dated: 01/02/2021 and Invoice Date: 02/03/2022",  # lower conf first in text
        "Total:    \nGrand Total: ₹12,345",  # anchor later than weak anchor
        "Sold By:    \nSold By: KISAN TRACTORS",  # empty-strip first match
        "no fields at all here",
        "₹99,999 currency-only fallback",
    ]
    for text in cases:
        for name in FIELD_NAMES:
            assert first_span(text, name) == best_span(
                field_candidates(text, name)
            ), (name, text[:80])
