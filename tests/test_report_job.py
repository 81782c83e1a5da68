"""jobs/report.py end-to-end: committed table -> JSON+SVG report +
pseudo-label parquet export (the reference's run_full_analysis surface)."""

import json
import os

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.sources.atomic import commit_append


def test_report_job_end_to_end(spark, tmp_path):
    from jobs.report import main

    tbl = str(tmp_path / "tbl")
    out = str(tmp_path / "report")
    pl = str(tmp_path / "pl")
    commit_append(extract_pages(spark.createDataFrame(pages_pdf(48))), tbl, run_id="r1")

    main(["--table", tbl, "--out", out, "--pseudo-labels", pl])

    report = json.load(open(os.path.join(out, "report.json")))
    assert report["field_success"]  # per-field rows present
    overall = next(r for r in report["field_success"] if r["field"] == "OVERALL")
    assert overall["n_total"] == 48 * 7
    assert os.path.exists(os.path.join(out, "error_distribution.svg"))

    got = spark.read.parquet(pl)
    rows = got.collect()
    assert all(r["consensus_confidence"] >= 0.85 for r in rows)
    assert all(r["usable_for_training"] for r in rows)
    assert 0 < len(rows) < 48  # a real slice, not everything
