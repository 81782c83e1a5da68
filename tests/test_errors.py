"""Error-analysis taxonomy tests (reference error_analysis.py:30-100 +
executable.py:155-181) over hand-built extraction rows with known outcomes."""

import json
import os


from invoice_extraction_spark.functions.fields import FIELD_NAMES
from invoice_extraction_spark.operators.errors import (
    SEVERITY_BY_CATEGORY,
    categorize_errors,
    confidence_vs_errors,
    error_distribution,
    error_severity_rollup,
    field_success_summary,
    save_error_report,
)

SPAN = {"value": "x", "start": 0, "end": 1, "conf": 0.9, "method": "anchor"}


def _row(url, present, invalid=(), conf=0.9, error=None, text="body text"):
    """present: fields with a validated span; invalid: found-but-rejected."""
    return {
        "url": url,
        "fields": {n: (dict(SPAN) if n in present else None) for n in FIELD_NAMES},
        "field_scores": {
            n: (1.0 if n in present else (0.5 if n in invalid else 0.0))
            for n in FIELD_NAMES
        },
        "confidence": conf,
        "n_fields_found": len(present),
        "error": error,
        "extracted_text": text,
    }


def _frame(spark):
    rows = [
        _row("a", present=set(FIELD_NAMES), conf=0.97),
        _row(
            "b",
            present=set(FIELD_NAMES) - {"invoice_id", "total"},
            invalid={"total"},
            conf=0.43,
        ),
        _row("c", present=set(), conf=0.0, error="ValueError: boom", text=""),
    ]
    schema = (
        "url string, "
        + "fields struct<"
        + ",".join(
            f"{n}:struct<value:string,start:int,end:int,conf:double,method:string>"
            for n in FIELD_NAMES
        )
        + ">, field_scores struct<"
        + ",".join(f"{n}:double" for n in FIELD_NAMES)
        + ">, confidence double, n_fields_found int, error string, extracted_text string"
    )
    return spark.createDataFrame(rows, schema=schema)


def test_categorize_errors_taxonomy(spark):
    got = {
        r["url"]: sorted(r["error_categories"])
        for r in categorize_errors(_frame(spark)).collect()
    }
    assert got["a"] == []
    assert got["b"] == sorted(
        [
            "MISSING_INVOICE_ID",
            "MISSING_TOTAL",
            "INVALID_TOTAL",
            "LOW_CONFIDENCE",
            "PARTIAL_EXTRACTION",
        ]
    )
    # all-missing doc: every MISSING_*, plus LOW_CONFIDENCE + PARSE_FAILURE +
    # EMPTY_TEXT; NO PARTIAL_EXTRACTION (the reference's 0 < count < n rule)
    assert got["c"] == sorted(
        [f"MISSING_{n.upper()}" for n in FIELD_NAMES]
        + ["LOW_CONFIDENCE", "PARSE_FAILURE", "EMPTY_TEXT"]
    )


def test_every_category_has_a_severity():
    for n in FIELD_NAMES:
        assert f"MISSING_{n.upper()}" in SEVERITY_BY_CATEGORY
        assert f"INVALID_{n.upper()}" in SEVERITY_BY_CATEGORY
    for c in ("LOW_CONFIDENCE", "PARTIAL_EXTRACTION", "PARSE_FAILURE", "EMPTY_TEXT"):
        assert c in SEVERITY_BY_CATEGORY


def test_rollups(spark):
    d = _frame(spark)
    dist = {r["category"]: r["n"] for r in error_distribution(d).collect()}
    assert dist["MISSING_INVOICE_ID"] == 2  # docs b and c
    assert dist["INVALID_TOTAL"] == 1
    assert dist["LOW_CONFIDENCE"] == 2

    sev = {r["severity"]: r["n"] for r in error_severity_rollup(d).collect()}
    # doc b: 2 CRITICAL (missing invoice_id+total) + 1 MEDIUM + 2 HIGH
    # doc c: 3 CRITICAL + 4 LOW (missing secondary) + 3 HIGH
    assert sev["CRITICAL"] == 5
    assert sev["MEDIUM"] == 1
    assert sev["HIGH"] == 5
    assert sev["LOW"] == 4

    bins = {r["conf_bin"]: r for r in confidence_vs_errors(d).collect()}
    assert bins["90-100%"]["avg_errors"] == 0.0
    assert bins["<70%"]["n_docs"] == 2
    assert bins["<70%"]["avg_errors"] == (5 + 10) / 2.0


def test_field_success_summary(spark):
    d = _frame(spark)
    got = {r["field"]: r for r in field_success_summary(d).collect()}
    assert got["invoice_id"]["n_ok"] == 1 and got["invoice_id"]["n_total"] == 3
    assert got["seller"]["n_ok"] == 2
    assert got["OVERALL"]["n_total"] == 3 * len(FIELD_NAMES)
    assert got["OVERALL"]["n_ok"] == 7 + 5 + 0
    assert got["OVERALL"]["pct"] == round((12) * 100.0 / 21, 4)


def test_save_error_report_sink(spark, tmp_path):
    out = str(tmp_path / "report")
    report = save_error_report(_frame(spark), out)
    assert os.path.exists(os.path.join(out, "report.json"))
    svg = open(os.path.join(out, "error_distribution.svg")).read()
    assert svg.startswith("<svg") and "MISSING_INVOICE_ID" in svg
    on_disk = json.load(open(os.path.join(out, "report.json")))
    assert on_disk == report
    assert report["severity"]["CRITICAL"] == 5


def test_categorization_is_pure_column(spark):
    """The categorizer must add zero Python stages (it rides the scan)."""
    from invoice_extraction_spark.plans.explain import has_row_python_udf

    q = categorize_errors(_frame(spark)).select("url", "error_categories")
    assert not has_row_python_udf(q)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan