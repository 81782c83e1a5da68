"""PDF text extraction: writer/reader round trip, content-stream operator
coverage, layout reassembly, furniture stripping, and pipeline dispatch.

The north rule's "PDF/layout parse" contract: byte-identical extracted text
per url must hold for application/pdf payloads exactly as for HTML.
"""

import datetime

import pytest

from invoice_extraction_spark.functions.pdf_text import (
    PdfError,
    build_pdf,
    content_stream,
    extract_pdf_pages_text,
    lines_to_runs,
    parse_pdf_blocks,
)

LINES = [
    "Invoice No: INV-123456",
    "Grand Total: 45,000",
    "the tractor harvest field supply is ready for delivery",
]


def _wrap(stream: bytes) -> bytes:
    return build_pdf([stream], compress=False)


def test_round_trip_and_determinism():
    pdf_a = build_pdf([lines_to_runs(LINES)])
    pdf_b = build_pdf([lines_to_runs(LINES)])
    assert pdf_a == pdf_b  # writer is a pure function
    assert extract_pdf_pages_text(pdf_a) == [LINES]
    assert extract_pdf_pages_text(pdf_a) == extract_pdf_pages_text(pdf_b)


def test_compressed_equals_uncompressed():
    raw = extract_pdf_pages_text(build_pdf([lines_to_runs(LINES)], compress=False))
    flate = extract_pdf_pages_text(build_pdf([lines_to_runs(LINES)], compress=True))
    assert raw == flate == [LINES]


def test_tj_array_kerning_vs_word_space():
    # small negative adjustments are kerning (no space); <= -180 is a word gap
    s = b"BT /F1 11 Tf 72 720 Td [(Hel) -20 (lo) -250 (world)] TJ ET"
    assert extract_pdf_pages_text(_wrap(s)) == [["Hello world"]]


def test_td_tstar_and_quote_ops():
    s = (
        b"BT /F1 11 Tf 14 TL 72 720 Td (first line here) Tj "
        b"T* (second line here) Tj (third line here) ' ET"
    )
    assert extract_pdf_pages_text(_wrap(s)) == [
        ["first line here", "second line here", "third line here"]
    ]


def test_td_sets_leading():
    s = b"BT /F1 11 Tf 72 720 TD (alpha beta gamma) Tj 0 -16 TD (delta) Tj T* (omega) Tj ET"
    # TD 0 -16 sets leading=16; T* then drops exactly one more line
    assert extract_pdf_pages_text(_wrap(s)) == [["alpha beta gamma", "delta", "omega"]]


def test_tm_absolute_positioning():
    s = b"BT /F1 11 Tf 1 0 0 1 72 700 Tm (lower) Tj 1 0 0 1 72 720 Tm (upper) Tj ET"
    assert extract_pdf_pages_text(_wrap(s)) == [["upper", "lower"]]


def test_literal_escapes_and_octal():
    s = rb"BT /F1 11 Tf 72 720 Td (a\(b\)c \101 back\\slash) Tj ET"
    assert extract_pdf_pages_text(_wrap(s)) == [["a(b)c A back\\slash"]]


def test_decode_literal_fast_path_and_operator_edges():
    """Round-6 walker internals (escape-free fast path in _decode_literal,
    bytes-compared operators): escape-free literals must decode identically
    to the escape-walking path, and malformed operand stacks (Td with one
    operand, TL with none) must stay no-ops that still clear the stack."""
    from invoice_extraction_spark.functions.pdf_text import _decode_literal

    # escape-free fast path == slow path output (latin-1 byte view)
    assert _decode_literal(b"plain text 123 #%&'") == "plain text 123 #%&'"
    assert _decode_literal(b"caf\xe9") == "café"
    # escapes still walk the slow path
    assert _decode_literal(rb"a\(b\)c \101 x\\y") == "a(b)c A x\\y"
    assert _decode_literal(b"line\\\ncontinued") == "linecontinued"
    # short-stack operators: no position change, operands consumed
    s = (
        b"BT /F1 11 Tf 72 720 Td 5 Td TL (anchored here still) Tj "
        b"99 (ignored-operand-run) Tf (second) ' ET"
    )
    # 5 Td (one operand) and bare TL are no-ops; ' after Tf drops one
    # leading (0 -> stays 720 band) and shows "second" at the same spot
    pages = extract_pdf_pages_text(_wrap(s))
    assert pages == [["anchored here still second"]]


def test_hex_utf16_strings():
    runs = [(72.0, 720.0, "Total: ₹830000"), (72.0, 706.0, "किसान बाजार")]
    pdf = build_pdf([content_stream(runs)])
    assert extract_pdf_pages_text(pdf) == [["Total: ₹830000", "किसान बाजार"]]


def test_two_column_reading_order():
    # right column emitted FIRST in the stream; layout assembly must recover
    # top-to-bottom, left-to-right reading order from (y, x)
    runs = [
        (320.0, 720.0, "right-top"),
        (320.0, 706.0, "right-bottom"),
        (72.0, 720.0, "left-top"),
        (72.0, 706.0, "left-bottom"),
    ]
    pdf = build_pdf([content_stream(runs)])
    assert extract_pdf_pages_text(pdf) == [
        ["left-top right-top", "left-bottom right-bottom"]
    ]


def test_furniture_folio_and_cross_page_repeats():
    header = "ACME QUARTERLY REPORT"
    p1 = ["real content words on the first page", header, "Page 1 of 2"]
    p2 = [header, "more real content words second page", "Page 2 of 2"]
    pdf = build_pdf([lines_to_runs(p1), lines_to_runs(p2)])
    blocks = parse_pdf_blocks(pdf)
    by_text = {b.text: b for b in blocks}
    assert by_text["Page 1 of 2"].region == "boiler"
    assert by_text["Page 2 of 2"].region == "boiler"
    assert by_text[header].region == "boiler"  # repeated across pages
    assert by_text["real content words on the first page"].is_content


def test_single_page_repeat_is_not_furniture():
    pdf = build_pdf([lines_to_runs(["hello repeated line words", "hello repeated line words"])])
    blocks = parse_pdf_blocks(pdf)
    assert all(b.region == "body" for b in blocks)


def test_contents_array_of_streams():
    # hand-build a page whose /Contents is an array of two stream objects
    s1 = b"BT /F1 11 Tf 72 720 Td (part one words here) Tj ET"
    s2 = b"BT /F1 11 Tf 72 706 Td (part two words here) Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(s1)).encode() + b" >>\nstream\n" + s1 + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(s2)).encode() + b" >>\nstream\n" + s2 + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n"
    )
    assert extract_pdf_pages_text(body) == [
        ["part one words here", "part two words here"]
    ]


def test_kv_blocks_pass_content_gate():
    pdf = build_pdf([lines_to_runs(["Total: ₹830000"])])
    (b,) = parse_pdf_blocks(pdf)
    assert b.is_content  # short key-value line passes via the colon rule


def test_errors_are_loud():
    with pytest.raises(PdfError):
        extract_pdf_pages_text(b"<html>not a pdf</html>")
    with pytest.raises(PdfError):
        extract_pdf_pages_text(b"%PDF-1.4\ngarbage with no objects")
    # unsupported filter is loud, not silently empty
    bad = _wrap(b"BT ET").replace(b">>\nstream", b"/Filter /LZWDecode >>\nstream")
    with pytest.raises(PdfError):
        extract_pdf_pages_text(bad)


# --- pipeline dispatch (Spark) --------------------------------------------


def test_extract_pages_dispatches_pdf_and_html(spark):
    from invoice_extraction_spark.corpus import synth_page, synth_pdf_doc
    from invoice_extraction_spark.operators.extract import extract_pages

    html_row = synth_page(7, seed=42)
    pdf_rows = [synth_pdf_doc(i, seed=42) for i in range(6)]
    rows = [
        (r["url"], r["warc_ts"], r["html"], r["lang"])
        for r in [html_row, *pdf_rows]
    ] + [("https://bad.example.com/x.pdf", datetime.datetime(2021, 3, 1), b"%PDF-1.4\nbroken", "en")]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, lang string")
    out = {r["url"]: r for r in extract_pages(df).collect()}

    # corrupt pdf degrades to an error row, never a task failure
    bad = out["https://bad.example.com/x.pdf"]
    assert bad["error"] is not None and bad["extracted_text"] == ""

    # planted pdf fields come back through the SAME anchor extractors
    checked = 0
    for r in pdf_rows:
        got = out[r["url"]]
        assert got["error"] is None
        assert got["n_blocks"] > 0
        for name, want in r["truth"].items():
            if want is None:
                continue
            span = got["fields"][name]
            assert span is not None, (r["url"], name)
            assert span["value"] == want
            checked += 1
    assert checked >= 5  # the seed plants a healthy number of fields

    # the html row still behaves exactly as before (dispatch didn't regress)
    assert out[html_row["url"]]["error"] is None


def test_pdf_extraction_deterministic(spark):
    from invoice_extraction_spark.corpus import synth_pdf_doc
    from invoice_extraction_spark.operators.extract import extract_pages

    rows = [(r["url"], r["warc_ts"], r["html"], r["lang"]) for r in (synth_pdf_doc(i) for i in range(4))]
    df = spark.createDataFrame(rows, "url string, warc_ts timestamp, html binary, lang string")
    a = sorted((r["url"], r["extracted_text"]) for r in extract_pages(df).collect())
    b = sorted((r["url"], r["extracted_text"]) for r in extract_pages(df).collect())
    assert a == b
    assert all(t for _, t in a)


def test_pdf_pipeline_matches_goldens(spark):
    """Byte-identity gate for the PDF path — the same north-rule contract
    the HTML goldens pin (regenerate ONLY on an intentional semantic
    change: scripts/freeze_pdf_goldens.py)."""
    import json
    import os

    from scripts.freeze_pdf_goldens import N_DOCS, pdf_corpus_pdf
    from invoice_extraction_spark.operators.extract import extract_pages

    path = os.path.join(os.path.dirname(__file__), "golden", "pdf_goldens.json")
    with open(path) as fh:
        goldens = json.load(fh)
    out = extract_pages(spark.createDataFrame(pdf_corpus_pdf()), num_partitions=8).collect()
    assert len(out) == N_DOCS == len(goldens)
    for r in out:
        g = goldens[r["url"]]
        assert r["extracted_text"].encode() == g["extracted_text"].encode(), r["url"]
        assert r["confidence"] == g["confidence"]
        assert r["consensus_confidence"] == g["consensus_confidence"]
        assert r["total_amount"] == g["total_amount"]
        for name, want in g["fields"].items():
            s = r["fields"][name]
            got = (
                None
                if s is None
                else {"value": s["value"], "start": s["start"], "end": s["end"], "conf": s["conf"], "method": s["method"]}
            )
            assert got == want, f"{r['url']}.{name}"


# --- property fuzz: writer -> reader round trip ----------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_words = st.text(
    alphabet=st.sampled_from(
        "abcXYZ019(){}\\<>/[]#%&'\"é₹क喂🙂-+.,:"
    ),
    min_size=1,
    max_size=8,
)
_lines = st.lists(
    st.lists(_words, min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(lines=_lines, compress=st.booleans())
def test_pdf_round_trip_fuzz(lines, compress):
    """Any single-spaced printable lines (incl. PDF delimiters, escapes,
    non-latin1 text) survive build -> extract byte-identically, compressed
    or not."""
    pdf = build_pdf([lines_to_runs(lines)], compress=compress)
    assert extract_pdf_pages_text(pdf) == [lines]
