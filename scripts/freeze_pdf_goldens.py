"""Freeze PDF golden fixtures: run the full Spark pipeline over the
deterministic synthetic PDF corpus (corpus.synth_pdf_doc) and write per-url
extracted_text + fields + confidence to tests/golden/pdf_goldens.json.
pytest (test_pdf.py) then asserts BYTE equality — the same north-rule
contract the HTML goldens pin, extended to the PDF/layout-parse path.

Run once (and re-run ONLY on an intentional semantic change):
    python scripts/freeze_pdf_goldens.py

Re-freeze log:
- 2026-08-16 (round 3): initial freeze, 32 docs.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402

from invoice_extraction_spark.corpus import synth_pdf_doc  # noqa: E402
from invoice_extraction_spark.operators.extract import extract_pages  # noqa: E402
from invoice_extraction_spark.session import get_spark  # noqa: E402

N_DOCS = 32
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "pdf_goldens.json")


def pdf_corpus_pdf(n_docs: int = N_DOCS):
    rows = [synth_pdf_doc(i) for i in range(n_docs)]
    pdf = pd.DataFrame(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        }
    )
    pdf["warc_ts"] = pdf["warc_ts"].astype("datetime64[us]")
    return pdf


def main():
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    df = spark.createDataFrame(pdf_corpus_pdf())
    rows = extract_pages(df, num_partitions=8).orderBy("url").collect()
    goldens = {}
    for r in rows:
        fields = {}
        for name in r["fields"].asDict():
            s = r["fields"][name]
            fields[name] = (
                None
                if s is None
                else {"value": s["value"], "start": s["start"], "end": s["end"], "conf": s["conf"], "method": s["method"]}
            )
        goldens[r["url"]] = {
            "extracted_text": r["extracted_text"],
            "fields": fields,
            "confidence": r["confidence"],
            "consensus_confidence": r["consensus_confidence"],
            "field_scores": r["field_scores"].asDict(),
            "error": r["error"],
            "total_amount": r["total_amount"],
            "n_blocks": r["n_blocks"],
            "n_content_blocks": r["n_content_blocks"],
        }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(goldens, fh, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"froze {len(goldens)} pdf goldens -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
