"""Structured Streaming incremental extraction: checkpointed AvailableNow
runs process only new files and commit atomically."""

import os

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.sources.atomic import read_table
from invoice_extraction_spark.streaming.incremental import run_incremental


def _write_batch(spark, pdf, path):
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(path)


def test_incremental_two_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    all_pages = pages_pdf(30)

    # drop 1: first 20 pages -> run -> 20 committed
    _write_batch(spark, all_pages.iloc[:20], src)
    run_incremental(spark, src, tbl, ckpt)
    assert read_table(spark, tbl).count() == 20

    # drop 2: 10 more pages -> run -> only the new ones processed
    _write_batch(spark, all_pages.iloc[20:], src)
    run_incremental(spark, src, tbl, ckpt)
    out = read_table(spark, tbl)
    assert out.count() == 30
    assert out.select("url").distinct().count() == 30
    # stream manifests present
    manifests = os.listdir(os.path.join(tbl, "_manifests"))
    assert len(manifests) >= 2
