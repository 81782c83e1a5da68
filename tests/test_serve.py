"""Interactive surface (jobs/serve.py — the reference's Streamlit entry
point E3, app.py:196-368): the HTTP console must run the SAME pipeline as
batch and return identical field values for the same page."""

import json
import threading
import urllib.request

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import extract_pages


@pytest.fixture(scope="module")
def server(spark):
    from jobs.serve import serve

    httpd = serve(spark, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_form_served(server):
    with urllib.request.urlopen(f"{server}/") as r:
        body = r.read().decode()
    assert "spark-webtext-extract" in body and "<form" in body


def test_api_matches_batch_pipeline(spark, server):
    page = pages_pdf(3).iloc[2]
    req = urllib.request.Request(
        f"{server}/api", data=bytes(page["html"]), method="POST"
    )
    with urllib.request.urlopen(req) as r:
        got = json.loads(r.read())

    batch = (
        extract_pages(spark.createDataFrame(pages_pdf(3)), num_partitions=2)
        .filter(F.col("url") == page["url"])
        .first()
    )
    assert got["extracted_text"] == batch["extracted_text"]
    assert got["n_fields_found"] == batch["n_fields_found"]
    assert got["confidence"] == batch["confidence"]
    assert got["total_amount"] == batch["total_amount"]
    fields = {k: (v or {}).get("value") for k, v in got["fields"].items()}
    want = {k: v["value"] if v else None for k, v in batch["fields"].asDict().items()}
    assert fields == want


def test_extract_renders_html(server):
    page = pages_pdf(1).iloc[0]
    boundary = "XBOUNDARYX"
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="page"; filename="p.html"\r\n'
        "Content-Type: text/html\r\n\r\n"
    ).encode() + bytes(page["html"]) + f"\r\n--{boundary}--\r\n".encode()
    req = urllib.request.Request(
        f"{server}/extract",
        data=body,
        headers={"Content-Type": f"multipart/form-data; boundary={boundary}"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        html_out = r.read().decode()
    assert "confidence" in html_out and "<table" in html_out


def test_empty_post_is_400(server):
    req = urllib.request.Request(f"{server}/api", data=b"  ", method="POST")
    try:
        urllib.request.urlopen(req)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_extract_one_handles_pdf(spark):
    """A PDF upload runs through the SAME pipeline via magic-byte dispatch."""
    from invoice_extraction_spark.corpus import synth_pdf_doc
    from jobs.serve import extract_one

    doc = next(
        d for d in (synth_pdf_doc(i) for i in range(20)) if d["truth"].get("invoice_id")
    )
    result = extract_one(spark, doc["html"])
    assert result["error"] is None
    assert result["fields"]["invoice_id"]["value"] == doc["truth"]["invoice_id"]


def test_multipart_payload_byte_exact_for_binary():
    """Binary payloads ending in '-'/CR/LF bytes (real PDFs can) must come
    through byte-exact — ADVICE r3: rstrip(b'\\r\\n-') truncated them."""
    from jobs.serve import _multipart_payload

    boundary = "XBOUNDARYX"
    payload = b"%PDF-1.4\x00\x01tricky tail-\r\n-"  # ends in -, CR, LF, -
    body = (
        f"--{boundary}\r\n"
        'Content-Disposition: form-data; name="page"; filename="p.pdf"\r\n'
        "Content-Type: application/pdf\r\n\r\n"
    ).encode() + payload + f"\r\n--{boundary}--\r\n".encode()
    got = _multipart_payload(body, f"multipart/form-data; boundary={boundary}")
    assert got == payload


def test_multipart_prefers_file_part_and_quoted_boundary():
    from jobs.serve import _multipart_payload

    boundary = "qQq"
    body = (
        b"--qQq\r\n"
        b'Content-Disposition: form-data; name="source"\r\n\r\n'
        b"textarea fallback\r\n"
        b"--qQq\r\n"
        b'Content-Disposition: form-data; name="page"; filename="f"\r\n\r\n'
        b"file wins\r\n"
        b"--qQq--\r\n"
    )
    got = _multipart_payload(body, 'multipart/form-data; boundary="qQq"')
    assert got == b"file wins"
