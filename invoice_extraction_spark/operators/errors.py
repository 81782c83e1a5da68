"""Error analytics over REAL extraction output (VERDICT r1 'What's missing'
#1) — the reference's error taxonomy (error_analysis.py:30-46), per-result
categorization (:48-100), severity rollup (:159-200), confidence-vs-errors
binning (:288-335), and the per-field batch success summary
(executable.py:155-181), re-expressed as pure Column / groupBy plans over the
extraction output DataFrame.

Taxonomy adaptation (7 webtext fields instead of the reference's 4 core + 2
image fields; all DETERMINISTIC — the reference's np.random-simulated
OCR_FAILURE/POOR_IMAGE_QUALITY coin-flips (error_analysis.py:95-100) are
deliberately replaced with the real evidence we have):

- MISSING_<FIELD>      field null after validation      (MISSING_DEALER family)
- INVALID_<FIELD>      span found but validation rejected it, i.e.
                       field_scores[f] == 0.5           (INVALID_*_RANGE family)
- LOW_CONFIDENCE       confidence < 0.8                 (same threshold, :78)
- PARTIAL_EXTRACTION   0 < n_fields_found < 7           (same rule, :83-90)
- PARSE_FAILURE        kernel error column non-null     (OCR_FAILURE analog)
- EMPTY_TEXT           extracted_text empty             (POOR_IMAGE_QUALITY analog)

Everything here is oracle-checked: the DuckDB twins re-derive the same
categories in SQL from the FROZEN golden fixtures, so a drift in either the
pipeline or this module breaks the hash.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.fields import FIELD_NAMES

LOW_CONFIDENCE_THRESHOLD = 0.8  # error_analysis.py:78

# Severity mapping mirrors error_analysis.py:163-169: core business fields
# CRITICAL, document-level quality HIGH, rejected-by-validation MEDIUM,
# secondary fields LOW.
CORE_FIELDS = ("invoice_id", "seller", "total")
SEVERITY_BY_CATEGORY: dict[str, str] = {
    **{f"MISSING_{f.upper()}": "CRITICAL" for f in CORE_FIELDS},
    **{
        f"MISSING_{f.upper()}": "LOW"
        for f in FIELD_NAMES
        if f not in CORE_FIELDS
    },
    **{f"INVALID_{f.upper()}": "MEDIUM" for f in FIELD_NAMES},
    "LOW_CONFIDENCE": "HIGH",
    "PARTIAL_EXTRACTION": "HIGH",
    "PARSE_FAILURE": "HIGH",
    "EMPTY_TEXT": "HIGH",
}


def categorize_errors(df: DataFrame) -> DataFrame:
    """Adds ``error_categories array<string>`` per result row — the
    error_analysis.py:48-100 categorizer as ONE Column expression (array of
    conditional labels, nulls filtered), so it rides the existing scan with
    zero extra stages or Python."""
    f = F.col("fields")
    fs = F.col("field_scores")
    cats = []
    for name in FIELD_NAMES:
        cats.append(F.when(f[name].isNull(), F.lit(f"MISSING_{name.upper()}")))
        cats.append(F.when(fs[name] == 0.5, F.lit(f"INVALID_{name.upper()}")))
    cats.append(
        F.when(F.col("confidence") < LOW_CONFIDENCE_THRESHOLD, F.lit("LOW_CONFIDENCE"))
    )
    cats.append(
        F.when(
            (F.col("n_fields_found") > 0) & (F.col("n_fields_found") < len(FIELD_NAMES)),
            F.lit("PARTIAL_EXTRACTION"),
        )
    )
    cats.append(F.when(F.col("error").isNotNull(), F.lit("PARSE_FAILURE")))
    cats.append(
        F.when(
            F.col("extracted_text").isNull() | (F.length("extracted_text") == 0),
            F.lit("EMPTY_TEXT"),
        )
    )
    arr = F.filter(F.array(*cats), lambda x: x.isNotNull())
    return df.withColumn("error_categories", arr)


def error_distribution(df: DataFrame) -> DataFrame:
    """Category frequency, most-common first (error_analysis.py:120-135's
    chart input). Explode is k<=18 small strings per doc; the groupBy key is
    tiny — shuffle-safe at any scale."""
    return (
        categorize_errors(df)
        .select(F.explode("error_categories").alias("category"))
        .groupBy("category")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "category")
    )


def error_severity_rollup(df: DataFrame) -> DataFrame:
    """Error-instance counts per severity (error_analysis.py:159-200)."""
    sev = F.create_map(
        *[F.lit(x) for kv in SEVERITY_BY_CATEGORY.items() for x in kv]
    )
    return (
        categorize_errors(df)
        .select(F.explode("error_categories").alias("category"))
        .select(sev[F.col("category")].alias("severity"))
        .groupBy("severity")
        .agg(F.count("*").alias("n"))
        .orderBy("severity")
    )


def confidence_bin(conf_col) -> F.Column:
    """The reference's four confidence bins (error_analysis.py:296-305)."""
    return (
        F.when(conf_col >= 0.9, "90-100%")
        .when(conf_col >= 0.8, "80-90%")
        .when(conf_col >= 0.7, "70-80%")
        .otherwise("<70%")
    )


def confidence_vs_errors(df: DataFrame) -> DataFrame:
    """Average error count per confidence bin (error_analysis.py:288-335) —
    docs with zero errors count as zero, exactly like the reference's
    per-result append."""
    d = categorize_errors(df).select(
        confidence_bin(F.col("confidence")).alias("conf_bin"),
        F.size("error_categories").alias("n_err"),
    )
    return (
        d.groupBy("conf_bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_err"), 4).alias("avg_errors"),
        )
        .orderBy("conf_bin")
    )


def field_success_summary(df: DataFrame) -> DataFrame:
    """Per-field success counts + rate, plus an OVERALL row — the batch
    self-score the reference prints at the end of every run
    (executable.py:155-181). Unpivot via explode of a per-row literal-field
    array (map-side; one tiny groupBy)."""
    f = F.col("fields")
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("field"),
                f[name].isNotNull().cast("long").alias("ok"),
            )
            for name in FIELD_NAMES
        ]
    )
    per = (
        df.select(F.explode(pairs).alias("x"))
        .groupBy(F.col("x.field").alias("field"))
        .agg(F.sum("x.ok").alias("n_ok"), F.count("*").alias("n_total"))
    )
    overall = per.agg(
        F.lit("OVERALL").alias("field"),
        F.sum("n_ok").alias("n_ok"),
        F.sum("n_total").alias("n_total"),
    )
    return (
        per.unionByName(overall)
        .withColumn(
            "pct", F.round(F.col("n_ok") * 100.0 / F.col("n_total"), 4)
        )
        .orderBy("field")
    )


# ---------------------------------------------------------------------------
# S8: report sink (JSON + SVG chart) — driver-side over the tiny aggregates
# ---------------------------------------------------------------------------

def _svg_barh(items: list[tuple[str, int]], title: str, width: int = 640) -> str:
    """Minimal dependency-free horizontal bar chart (the reference writes
    matplotlib PNGs, error_analysis.py:134-155; this container has no
    plotting libs, and SVG-as-text is the honest stdlib equivalent)."""
    row_h, pad, label_w = 24, 8, 220
    n = max(len(items), 1)
    vmax = max((v for _, v in items), default=1) or 1
    h = pad * 2 + 30 + row_h * n
    out = [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{width}" height="{h}" '
        f'font-family="sans-serif" font-size="12">',
        f'<text x="{pad}" y="{pad + 14}" font-size="16" font-weight="bold">{title}</text>',
    ]
    for i, (label, v) in enumerate(items):
        y = pad + 30 + i * row_h
        bar_w = int((width - label_w - 60) * v / vmax)
        out.append(f'<text x="{pad}" y="{y + 15}">{label}</text>')
        out.append(
            f'<rect x="{label_w}" y="{y + 3}" width="{max(bar_w, 1)}" height="{row_h - 8}" fill="#c0392b"/>'
        )
        out.append(f'<text x="{label_w + bar_w + 4}" y="{y + 15}">{v}</text>')
    out.append("</svg>")
    return "\n".join(out)


def save_error_report(df: DataFrame, out_dir: str) -> dict:
    """The reference's run_full_analysis sink (error_analysis.py:211-224 JSON
    report + chart files): collects the four SMALL aggregates (bounded by
    category/field cardinality, never by table size) and writes report.json +
    error_distribution.svg. Returns the report dict."""
    os.makedirs(out_dir, exist_ok=True)
    dist = [(r["category"], r["n"]) for r in error_distribution(df).collect()]
    sev = {r["severity"]: r["n"] for r in error_severity_rollup(df).collect()}
    bins = [r.asDict() for r in confidence_vs_errors(df).collect()]
    fields = [r.asDict() for r in field_success_summary(df).collect()]
    report = {
        "error_distribution": [{"category": c, "n": n} for c, n in dist],
        "severity": sev,
        "confidence_vs_errors": bins,
        "field_success": fields,
    }
    with open(os.path.join(out_dir, "report.json"), "w") as fh:
        json.dump(report, fh, indent=2)
    with open(os.path.join(out_dir, "error_distribution.svg"), "w") as fh:
        fh.write(_svg_barh(dist, "Error Category Distribution"))
    return report
