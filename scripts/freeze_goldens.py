"""Freeze golden fixtures (FIXTURES.md §2): run the full Spark pipeline over
the deterministic corpus and write per-url extracted_text + fields +
confidence to tests/golden/goldens.json. pytest then asserts BYTE equality.

Run once (and re-run ONLY on an intentional semantic change):
    python scripts/freeze_goldens.py

Re-freeze log:
- 2026-08-16 (round 1): initial freeze; re-frozen for the three-layout corpus.
- 2026-08-16 (round 2): ADDED keys consensus_confidence / field_scores /
  error — consensus now blends per-field VALIDATION scores (VERDICT r1
  'What's missing' #2), and the error-analysis DuckDB oracles re-derive the
  taxonomy from these frozen values. extracted_text / fields / confidence /
  total_amount are byte-identical to round 1 (kernel unchanged).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from invoice_extraction_spark.corpus import pages_pdf  # noqa: E402
from invoice_extraction_spark.operators.extract import extract_pages  # noqa: E402
from invoice_extraction_spark.session import get_spark  # noqa: E402

N_DOCS = 64
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "goldens.json")


def main():
    spark = get_spark(master="local[4]", shuffle_partitions=8)
    df = spark.createDataFrame(pages_pdf(N_DOCS))
    out = extract_pages(df, num_partitions=8).orderBy("url")
    rows = out.collect()
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
    print(f"froze {len(goldens)} goldens -> {OUT}")
    spark.stop()


if __name__ == "__main__":
    main()
