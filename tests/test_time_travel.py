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


def test_read_appended_incremental_scan(spark, tmp_path):
    """Incremental reads return exactly the delta between two snapshots,
    empty for no-new-data, and refuse to cross a compaction rewrite."""
    import pytest as _pytest

    from invoice_extraction_spark.corpus import pages_pdf
    from invoice_extraction_spark.operators.extract import extract_pages
    from invoice_extraction_spark.sources.atomic import (
        commit_append,
        compact,
        read_appended,
    )

    tbl = str(tmp_path / "tbl")
    pdf = pages_pdf(12)
    df = spark.createDataFrame(pdf)
    commit_append(extract_pages(df.limit(4)), tbl, run_id="r1")
    commit_append(extract_pages(df.limit(8).subtract(df.limit(4))), tbl, run_id="r2")
    commit_append(extract_pages(df.subtract(df.limit(8))), tbl, run_id="r3")

    # delta after r1 = r2+r3 rows; window (r1, r2] = r2 only
    assert read_appended(spark, tbl, "r1").count() == 8
    only_r2 = read_appended(spark, tbl, "r1", until="r2")
    assert only_r2.count() == 4
    # ordinals work too, and agree with run_ids
    assert read_appended(spark, tbl, 0, until=1).count() == 4
    # no new data -> empty frame with the table schema
    empty = read_appended(spark, tbl, "r3")
    assert empty.count() == 0 and "extracted_text" in empty.columns

    # the delta really is r2's rows, not a resample of history
    urls_r2 = {r["url"] for r in only_r2.select("url").collect()}
    r1_rows = {r["url"] for r in read_table(spark, tbl, as_of="r1").select("url").collect()}
    assert urls_r2 and not (urls_r2 & r1_rows)

    # compaction rewrites history: crossing it must raise
    compact(spark, tbl)
    with _pytest.raises(ValueError):
        read_appended(spark, tbl, "r1")
    # but reading from the compaction snapshot onward is fine (empty so far)
    assert read_appended(spark, tbl, 3).count() == 0


def test_additive_schema_evolution(spark, tmp_path):
    """A later snapshot may add columns: full reads null them for old rows,
    time travel shows the schema as of that snapshot, incremental reads
    carry the new column."""
    from pyspark.sql import functions as F

    from invoice_extraction_spark.sources.atomic import read_appended

    tbl = str(tmp_path / "tbl")
    pdf = pages_pdf(6)
    df = spark.createDataFrame(pdf)
    v1 = extract_pages(df.limit(3))
    commit_append(v1, tbl, run_id="v1")
    v2 = extract_pages(df.subtract(df.limit(3))).withColumn(
        "quality", F.lit(0.9)
    )
    commit_append(v2, tbl, run_id="v2")

    full = read_table(spark, tbl)
    assert "quality" in full.columns
    assert full.count() == 6
    assert full.filter("quality IS NULL").count() == 3  # old rows -> null

    old = read_table(spark, tbl, as_of="v1")
    assert "quality" not in old.columns  # time travel sees the old schema

    delta = read_appended(spark, tbl, "v1")
    assert delta.count() == 3
    assert delta.filter("quality = 0.9").count() == 3


def test_rollback_and_recommit(spark, tmp_path):
    """Rollback archives later snapshots (metadata-only), every reader sees
    the old head, vacuum collects the orphaned files, history continues."""
    from invoice_extraction_spark.sources.atomic import (
        lineage_df,
        list_manifests,
        rollback,
        vacuum,
    )

    tbl = str(tmp_path / "tbl")
    pdf = pages_pdf(9)
    df = spark.createDataFrame(pdf)
    commit_append(extract_pages(df.limit(3)), tbl, run_id="good")
    bad = extract_pages(df.limit(6).subtract(df.limit(3)))
    commit_append(bad, tbl, run_id="bad")

    res = rollback(tbl, "good")
    assert res["rolled_back_to"] == "good"
    assert len(res["archived_manifests"]) == 1
    assert read_table(spark, tbl).count() == 3
    assert [m["run_id"] for m in list_manifests(tbl)] == ["good"]
    assert set(lineage_df(spark, tbl).select("run_id").toPandas()["run_id"]) == {"good"}

    # orphaned files are dead to vacuum now
    removed = vacuum(tbl)
    assert removed  # the bad commit's files went away
    assert read_table(spark, tbl).count() == 3  # live data untouched

    # history continues linearly after the rollback
    commit_append(extract_pages(df.subtract(df.limit(6))), tbl, run_id="retry")
    assert read_table(spark, tbl).count() == 6
    assert [m["run_id"] for m in list_manifests(tbl)] == ["good", "retry"]


def test_rollback_refuses_vacuumed_target(spark, tmp_path):
    """Rolling back to a pre-compaction state whose files were vacuumed must
    raise — never silently produce an unreadable table."""
    from invoice_extraction_spark.sources.atomic import compact, rollback, vacuum

    tbl = str(tmp_path / "tbl")
    df = spark.createDataFrame(pages_pdf(4))
    commit_append(extract_pages(df), tbl, run_id="v1")
    compact(spark, tbl)
    vacuum(tbl)  # v1's files are superseded by the compaction -> collected
    with pytest.raises(FileNotFoundError):
        rollback(tbl, "v1")
    assert read_table(spark, tbl).count() == 4  # table still healthy
