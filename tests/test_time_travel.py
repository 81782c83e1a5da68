"""Snapshot time travel on the atomic table (Iceberg-parity read semantics)."""

import pytest

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.sources.atomic import commit_append, read_table


def test_as_of_snapshot_index_and_run_id(spark, tmp_path):
    tbl = str(tmp_path / "t")
    src = spark.createDataFrame(pages_pdf(30))
    commit_append(extract_pages(src.limit(10)), tbl, run_id="s0")
    commit_append(extract_pages(src.limit(20)), tbl, run_id="s1")
    commit_append(extract_pages(src), tbl, run_id="s2")

    assert read_table(spark, tbl).count() == 60  # appends accumulate
    assert read_table(spark, tbl, as_of=0).count() == 10
    assert read_table(spark, tbl, as_of=1).count() == 30
    assert read_table(spark, tbl, as_of="s1").count() == 30
    assert read_table(spark, tbl, as_of="s2").count() == 60
    with pytest.raises(FileNotFoundError):
        read_table(spark, tbl, as_of="nope")


def test_error_rows_flow_through(spark):
    import pandas as pd

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["ok", "huge"],
                "warc_ts": pd.to_datetime(["2021-01-01"] * 2).astype("datetime64[us]"),
                "html": [b"<p>fine text here indeed</p>", b"<p>" + b"x" * 10 + b"</p>"],
                "text": ["", ""],
                "lang": ["en", "en"],
            }
        )
    )
    out = {r["url"]: r for r in extract_pages(bad).collect()}
    assert out["ok"]["error"] is None
    assert out["ok"]["consensus_confidence"] is not None
    assert 0.0 <= out["ok"]["consensus_confidence"] <= 1.0
