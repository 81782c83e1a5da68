"""Golden-fixture byte-identity tests — THE north-rule correctness gate
(BASELINE.json input_hint: "byte-identical extracted text per url").

Two layers:
1. pure-kernel: extract_text(html) must byte-equal the frozen golden per url
   (no Spark involved — catches kernel drift in isolation);
2. full Spark pipeline: extracted_text + validated fields + confidence must
   all equal the goldens (catches Arrow/UDF/validation drift).
"""

import json
import os

import pytest

from invoice_extraction_spark.corpus import pages_pdf, synth_pages
from invoice_extraction_spark.functions.html_blocks import extract_text
from invoice_extraction_spark.operators.extract import extract_pages

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "goldens.json")
N_DOCS = 64


@pytest.fixture(scope="module")
def goldens():
    with open(GOLDEN_PATH) as fh:
        return json.load(fh)


def test_kernel_extracted_text_byte_identical(goldens):
    pages = synth_pages(N_DOCS)
    assert len(goldens) == N_DOCS
    for p in pages:
        got = extract_text(p["html"])
        want = goldens[p["url"]]["extracted_text"]
        assert got.encode("utf-8") == want.encode("utf-8"), p["url"]


def test_corpus_determinism():
    a = synth_pages(16)
    b = synth_pages(16)
    assert [r["html"] for r in a] == [r["html"] for r in b]
    assert [r["url"] for r in a] == [r["url"] for r in b]


def test_spark_pipeline_matches_goldens(spark, goldens):
    df = spark.createDataFrame(pages_pdf(N_DOCS))
    out = extract_pages(df, num_partitions=8).collect()
    assert len(out) == N_DOCS
    for r in out:
        g = goldens[r["url"]]
        assert r["extracted_text"].encode("utf-8") == g["extracted_text"].encode("utf-8")
        assert r["confidence"] == g["confidence"]
        assert r["consensus_confidence"] == g["consensus_confidence"]
        assert r["field_scores"].asDict() == g["field_scores"]
        assert r["total_amount"] == g["total_amount"]
        for name, want in g["fields"].items():
            s = r["fields"][name]
            got = (
                None
                if s is None
                else {"value": s["value"], "start": s["start"], "end": s["end"], "conf": s["conf"], "method": s["method"]}
            )
            assert got == want, f"{r['url']}.{name}"


def test_truth_recall_on_anchored_fields(spark):
    """Semantic sanity beyond byte-identity: wherever the corpus generator
    planted an anchored field (and it isn't an intended validation decoy),
    the pipeline recovers exactly the planted value."""
    pages = synth_pages(N_DOCS)
    truth_by_url = {p["url"]: p["truth"] for p in pages}
    df = spark.createDataFrame(pages_pdf(N_DOCS))
    out = extract_pages(df).collect()
    checked = 0
    for r in out:
        truth = truth_by_url[r["url"]]
        for name, want in truth.items():
            s = r["fields"][name]
            if want is None:  # decoy: validator must have nulled it
                assert s is None, f"{r['url']}.{name} should be rejected"
            elif name == "seller" and s is None:
                continue  # manufacturer decoy rejected by design
            else:
                assert s is not None and s["value"] == want, f"{r['url']}.{name}"
            checked += 1
    assert checked > 50  # enough planted fields to mean something
