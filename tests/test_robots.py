"""Meta-robots noindex gate: rule coverage, false-positive guards, DuckDB
dialect parity, plan hygiene."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.robots import (
    NOINDEX_RE,
    drop_noindex,
    meta_noindex,
)
from invoice_extraction_spark.plans.explain import has_row_python_udf

CASES = [
    # (html, should_be_flagged)
    (b'<html><head><meta name="robots" content="noindex"></head></html>', True),
    (b'<meta name="robots" content="noindex, nofollow">', True),
    (b"<meta name=robots content=noindex>", True),  # unquoted
    (b'<META NAME="ROBOTS" CONTENT="NOINDEX">', True),  # case
    (b'<meta content="noindex" name="robots">', True),  # reversed attrs
    (b'<meta name="googlebot" content="noindex">', True),
    (b'<meta name="robots" content="index, follow">', False),
    (b'<meta name="description" content="how to noindex a page">', False),
    (b"<p>discussion of the noindex directive</p>", False),
    (b'<meta name="viewport" content="width=device-width">', False),
    (b"%PDF-1.4 not html at all", False),
    (b"", False),
]


def test_rule_cases(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "html": [c[0] for c in CASES]})
    )
    got = {
        r["i"]: r["f"]
        for r in df.select("i", meta_noindex("html").alias("f")).collect()
    }
    for i, (html, want) in enumerate(CASES):
        assert got[i] == want, (i, html)


def test_duckdb_same_rule():
    """RE2 evaluates the identical regex to the same verdicts (dialect
    parity — the same proof pattern as the PII query)."""
    import duckdb

    con = duckdb.connect()
    con.register(
        "pages",
        pd.DataFrame(
            {"i": range(len(CASES)), "html": [c[0].decode("utf-8") for c in CASES]}
        ),
    )
    sql_re = NOINDEX_RE.replace("'", "''")
    got = con.sql(
        f"SELECT i, regexp_matches(html, '{sql_re}') AS f FROM pages ORDER BY i"
    ).df()
    assert got["f"].tolist() == [c[1] for c in CASES]
    con.close()


def test_drop_noindex_filters_and_stays_columnar(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"i": range(len(CASES)), "html": [c[0] for c in CASES]})
    )
    kept = drop_noindex(df)
    assert kept.count() == sum(1 for _, flagged in CASES if not flagged)
    assert not has_row_python_udf(kept)
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # map-only gate


def test_extract_job_respects_noindex(spark, tmp_path):
    from invoice_extraction_spark.corpus import pages_pdf
    from invoice_extraction_spark.sources.atomic import read_table
    from jobs.extract import main

    pdf = pages_pdf(4)
    pdf.loc[0, "html"] = pdf.loc[0, "html"].replace(
        b"<head>", b'<head><meta name="robots" content="noindex">'
    )
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(pdf).write.parquet(src)
    tbl = str(tmp_path / "out")
    main(["--source", src, "--table", tbl, "--respect-noindex", "--partitions", "2"])
    urls = {r["url"] for r in read_table(spark, tbl).select("url").collect()}
    assert pdf.loc[0, "url"] not in urls and len(urls) == 3


def test_binary_payloads_never_throw(spark):
    """PDF/binary payloads (invalid UTF-8) must pass the gate untouched —
    ANSI-mode decode would throw on UTF-8; the latin-1 decode is total."""
    from invoice_extraction_spark.corpus import synth_pdf_doc

    rows = [(i, synth_pdf_doc(i)["html"]) for i in range(3)] + [
        (99, bytes(range(256)))
    ]
    df = spark.createDataFrame(rows, "i long, html binary")
    assert drop_noindex(df).count() == 4
