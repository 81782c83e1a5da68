"""Compaction (rewrite_data_files parity): base manifest supersedes earlier
snapshots, appends after compaction keep working, time travel still sees
pre-compaction history boundaries."""

import os

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.sources.atomic import (
    commit_append,
    committed_files,
    compact,
    read_table,
)


def test_compact_preserves_rows_and_shrinks_files(spark, tmp_path):
    tbl = str(tmp_path / "t")
    src = spark.createDataFrame(pages_pdf(30))
    for i in range(3):
        commit_append(
            extract_pages(src.limit(10 * (i + 1))), tbl, run_id=f"s{i}"
        )
    before = read_table(spark, tbl)
    n_before = before.count()  # 60: appends accumulate (10+20+30)
    before_rows = {(r["url"], r["extracted_text"]) for r in before.collect()}
    n_files_before = len(committed_files(tbl))

    m = compact(spark, tbl, target_files=2)
    assert m["base"] is True
    after = read_table(spark, tbl)
    after_rows = {(r["url"], r["extracted_text"]) for r in after.collect()}
    assert after_rows == before_rows  # byte-for-byte same table contents
    assert len(committed_files(tbl)) <= 2 < n_files_before

    # appends after compaction stack on the base snapshot
    commit_append(extract_pages(src.limit(5)), tbl, run_id="post")
    assert read_table(spark, tbl).count() == n_before + 5

    # time travel to a pre-compaction snapshot still works
    assert read_table(spark, tbl, as_of="s0").count() == 10

    # old data files still on disk (GC is separate), but ignored by readers
    assert os.path.isdir(os.path.join(tbl, "data"))


def test_vacuum_after_partitioned_commit(spark, tmp_path):
    """vacuum must walk hive-partitioned snapshot dirs recursively: liveness
    compares FULL nested paths (ADVICE r3 high — the top-level-only listing
    classified live partitioned data as dead and unlink()ed the lang=xx
    directory itself)."""
    from invoice_extraction_spark.sources.atomic import vacuum

    tbl = str(tmp_path / "pt")
    src = spark.createDataFrame(pages_pdf(20))
    commit_append(extract_pages(src), tbl, run_id="p0", partition_by=["lang"])
    n = read_table(spark, tbl).count()

    # only live (partitioned) data: vacuum deletes nothing, table intact
    assert vacuum(tbl) == []
    assert read_table(spark, tbl).count() == n

    # compaction supersedes the partitioned snapshot: vacuum must collect the
    # NESTED parquet files without crashing, and leave the live base alone
    compact(spark, tbl, target_files=1)
    deleted = vacuum(tbl)
    assert deleted and all(p.endswith(".parquet") for p in deleted)
    assert any(os.sep + "lang=" in p for p in deleted)  # nested files found
    assert read_table(spark, tbl).count() == n
    assert vacuum(tbl) == []  # idempotent
