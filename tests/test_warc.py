"""WARC source: plain + gzip-member segments -> input-hint rows; request/
metadata records skipped; malformed records tolerated; full pipeline runs
end-to-end on WARC input and matches the parquet-path goldens."""

import json
import os

from invoice_extraction_spark.corpus import pages_pdf, synth_pages
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.sources.warc import (
    parse_warc,
    read_warc,
    write_warc_record,
)

TS = "2021-03-01T10:00:00Z"


def _segment(pages, gzip_member=False):
    out = b""
    for p in pages:
        out += write_warc_record(p["url"], TS, p["html"], gzip_member=gzip_member)
    return out


def test_parse_warc_roundtrip_plain_and_gzip():
    pages = synth_pages(6)
    for gz in (False, True):
        recs = list(parse_warc(_segment(pages, gzip_member=gz)))
        assert [r[0] for r in recs] == [p["url"] for p in pages]
        assert [r[2] for r in recs] == [p["html"] for p in pages]
        assert all(str(r[1])[:10] == "2021-03-01" for r in recs)


def test_parse_warc_skips_non_response_and_garbage():
    req = (
        b"WARC/1.0\r\nWARC-Type: request\r\nWARC-Target-URI: http://x/\r\n"
        b"Content-Length: 4\r\n\r\nGET /\r\n\r\n"
    )
    bad = b"WARC/1.0\r\nContent-Length: oops\r\n\r\n"
    good = write_warc_record("http://ok/", TS, b"<p>hi</p>")
    recs = list(parse_warc(req + bad + good))
    assert [r[0] for r in recs] == ["http://ok/"]
    assert recs[0][2] == b"<p>hi</p>"


def test_read_warc_to_extraction_matches_parquet_path(spark, tmp_path):
    """The same pages via WARC segments and via the parquet corpus must
    extract byte-identically (source format is transparent to the kernel)."""
    pages = synth_pages(24)
    seg_dir = tmp_path / "segs"
    os.makedirs(seg_dir)
    (seg_dir / "seg-00000.warc").write_bytes(_segment(pages[:12]))
    (seg_dir / "seg-00001.warc.gz").write_bytes(_segment(pages[12:], gzip_member=True))

    df = read_warc(spark, str(seg_dir / "*"))
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 24
    assert rows[pages[0]["url"]]["html"] == pages[0]["html"]
    assert {os.path.basename(r["segment"]) for r in rows.values()} == {
        "seg-00000.warc",
        "seg-00001.warc.gz",
    }

    via_warc = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(df.drop("segment")).collect()
    }
    via_parquet = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(spark.createDataFrame(pages_pdf(24))).collect()
    }
    assert via_warc == via_parquet


def test_warc_golden_texts(spark, tmp_path):
    """WARC-sourced extraction equals the frozen goldens byte-for-byte."""
    goldens = json.load(
        open(os.path.join(os.path.dirname(__file__), "golden", "goldens.json"))
    )
    pages = synth_pages(16)
    seg = tmp_path / "g.warc.gz"
    seg.write_bytes(_segment(pages, gzip_member=True))
    out = extract_pages(read_warc(spark, str(seg)).drop("segment")).collect()
    assert len(out) == 16
    for r in out:
        assert r["extracted_text"] == goldens[r["url"]]["extracted_text"]


def test_pdf_payload_through_warc(spark, tmp_path):
    """A PDF record in a WARC segment extracts identically to the same PDF
    via the parquet path — format dispatch is source-agnostic."""
    from invoice_extraction_spark.corpus import synth_pdf_doc
    from invoice_extraction_spark.operators.extract import extract_pages
    from invoice_extraction_spark.sources.warc import read_warc

    docs = [synth_pdf_doc(i) for i in range(3)]
    seg = b"".join(write_warc_record(d["url"], TS, d["html"]) for d in docs)
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    (seg_dir / "seg-0.warc").write_bytes(seg)

    via_warc = {
        r["url"]: r["extracted_text"]
        for r in extract_pages(read_warc(spark, str(seg_dir)).drop("segment")).collect()
    }
    rows = [(d["url"], None, d["html"], None) for d in docs]
    direct = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, lang string"
    )
    via_parquet = {
        r["url"]: r["extracted_text"] for r in extract_pages(direct).collect()
    }
    assert via_warc == via_parquet
    assert all(t for t in via_warc.values())
