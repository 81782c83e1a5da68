"""Atomic snapshot commit + lineage + resume tests (north rule; SURVEY.md §2.9).

The resume contract (FIXTURES.md §6): kill a run after a partial commit,
restart, and assert (a) no url extracted twice, (b) final output equals an
uninterrupted run.
"""

import os

from pyspark.sql import functions as F

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.sources.atomic import (
    commit_append,
    lineage_df,
    pending_source,
    read_table,
)

N = 40


def test_commit_read_roundtrip(spark, tmp_path):
    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    out = extract_pages(src)
    m = commit_append(out, tbl, run_id="r1")
    assert sorted(os.path.basename(f) for f in m["files"])
    got = read_table(spark, tbl)
    assert got.count() == N
    assert set(got.columns) >= {"url", "extracted_text", "fields", "confidence"}


def test_lineage_counters(spark, tmp_path):
    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    commit_append(extract_pages(src, num_partitions=4), tbl, run_id="r1")
    ln = lineage_df(spark, tbl)
    rows = ln.collect()
    assert sum(r["n_rows"] for r in rows) == N
    assert all(r["run_id"] == "r1" for r in rows)
    assert sum(r["n_ok"] for r in rows) == N  # all pages have extractable text
    assert sum(r["bytes_in"] for r in rows) > 0
    assert len(rows) > 1  # genuinely per-partition


def test_crash_before_manifest_is_invisible(spark, tmp_path):
    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    out = extract_pages(src)
    # simulate a crashed run: data files land, manifest never published
    out.limit(7).write.mode("overwrite").parquet(os.path.join(tbl, "data", "crashed"))
    # committed view must not exist yet
    try:
        read_table(spark, tbl)
        raise AssertionError("uncommitted data became visible")
    except FileNotFoundError:
        pass
    # resume sees the full source as pending
    assert pending_source(src, tbl).count() == N


def test_resume_no_double_extraction_and_equal_output(spark, tmp_path):
    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))

    # run 1: commits only the first half (simulates a mid-job kill after one
    # good snapshot)
    first_half = src.orderBy("url").limit(N // 2)
    commit_append(extract_pages(first_half), tbl, run_id="half")

    # restart: only the remaining urls are pending
    pending = pending_source(src, tbl)
    assert pending.count() == N - N // 2
    committed_urls = {r["url"] for r in read_table(spark, tbl).select("url").collect()}
    pending_urls = {r["url"] for r in pending.select("url").collect()}
    assert not committed_urls & pending_urls  # (a) no url twice

    commit_append(extract_pages(pending), tbl, run_id="rest")

    # (b) resumed output == uninterrupted run, byte-for-byte
    resumed = {
        r["url"]: (r["extracted_text"], r["confidence"])
        for r in read_table(spark, tbl).collect()
    }
    single = {
        r["url"]: (r["extracted_text"], r["confidence"])
        for r in extract_pages(src).collect()
    }
    assert resumed == single

    # lineage reflects both runs
    runs = {r["run_id"] for r in lineage_df(spark, tbl).collect()}
    assert runs == {"half", "rest"}


def test_commit_is_single_pass(spark, tmp_path, monkeypatch):
    """VERDICT r1 #3: lineage counters must come from the write job itself
    (accumulator epilogue), not a second scan of the written output — at
    100 TB the round-1 re-read doubled the table I/O. Assert commit_append
    never issues a read: any spark.read.parquet during the commit fails the
    test. (Job COUNT is not assertable — AQE materializes the repartition
    stage as its own job even though the data flows once.)"""
    import pyspark.sql.readwriter as rw

    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    out = extract_pages(src, num_partitions=4)

    reads = []
    orig = rw.DataFrameReader.parquet

    def spy(self, *paths, **kw):
        reads.append(paths)
        return orig(self, *paths, **kw)

    monkeypatch.setattr(rw.DataFrameReader, "parquet", spy)
    commit_append(out, tbl, run_id="r1")
    assert reads == [], f"commit_append re-read written data: {reads}"
    # and the lineage is still complete, still genuinely per-partition
    rows = lineage_df(spark, tbl).collect()
    assert sum(r["n_rows"] for r in rows) == N
    assert len(rows) > 1


def test_partitioned_commit_prunes_at_scan(spark, tmp_path):
    """partition_by writes hive-partitioned snapshots: a filter on the
    partition column must show up as a scan-time PartitionFilter (whole
    directories pruned — the Iceberg partition-spec analog), and the table
    contract (roundtrip, lineage, mixed plain+partitioned snapshots) holds."""
    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    out = extract_pages(src, num_partitions=4)
    commit_append(out.filter("lang = 'en'"), tbl, run_id="en", partition_by=["lang"])
    commit_append(out.filter("lang <> 'en'"), tbl, run_id="rest", partition_by=["lang"])

    got = read_table(spark, tbl)
    assert got.count() == N
    assert set(got.columns) >= {"url", "extracted_text", "lang"}
    en = got.filter(F.col("lang") == "en")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:120], plan
    assert en.count() == out.filter("lang = 'en'").count()

    # mixed table: a later UNpartitioned snapshot unions cleanly
    commit_append(
        extract_pages(spark.createDataFrame(pages_pdf(N + 8)).orderBy("url").limit(8)),
        tbl,
        run_id="plain",
    )
    assert read_table(spark, tbl).count() == N + 8

    runs = {r["run_id"] for r in lineage_df(spark, tbl).collect()}
    assert runs == {"en", "rest", "plain"}


def test_footer_lineage_mode_zero_python_and_exact_sums(spark, tmp_path):
    """lineage_mode='footer': per-partition row counts come from parquet
    FOOTER metadata + one Observation summary row — the commit adds ZERO
    Python stages beyond the extraction kernel itself, and lineage column
    sums equal the epilogue mode's."""
    from invoice_extraction_spark.plans.explain import count_python_stages

    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    out = extract_pages(src, num_partitions=4)
    assert count_python_stages(out) == 1  # the extraction kernel only
    commit_append(out, tbl, run_id="r1", lineage_mode="footer")
    rows = lineage_df(spark, tbl).collect()
    assert sum(r["n_rows"] for r in rows) == N
    assert sum(r["n_ok"] for r in rows) == N
    assert sum(r["bytes_in"] for r in rows) > 0
    assert len([r for r in rows if r["partition_id"] >= 0]) > 1  # per-partition
    assert read_table(spark, tbl).count() == N
    # empty append still publishes nothing
    m = commit_append(out.filter("url = 'nope'"), tbl, lineage_mode="footer")
    assert m.get("empty") is True


def test_resume_plan_uses_anti_join(spark, tmp_path):
    tbl = str(tmp_path / "out")
    src = spark.createDataFrame(pages_pdf(N))
    commit_append(extract_pages(src.limit(5)), tbl, run_id="r1")
    plan = pending_source(src, tbl)._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan
