"""Manifest-level file statistics + scan-time file skipping (Iceberg
file-stats analog): stats recorded from footers only, pruned reads touch
fewer files, pruning is conservative (bounds only bound), and stat-less
tables are unaffected."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.sources.atomic import (
    commit_append,
    list_manifests,
    prune_report,
    read_table,
)


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    """10 files, each covering a disjoint doc_id range (clustered write —
    repartitionByRange gives files min/max locality, like any time- or
    key-ordered ingest)."""
    tbl = str(tmp_path_factory.mktemp("statstbl") / "tbl")
    pdf = pd.DataFrame(
        {
            "doc_id": range(1000),
            "extracted_text": [f"document number {i} text" for i in range(1000)],
            "score": [float(i % 97) for i in range(1000)],
        }
    )
    df = spark.createDataFrame(pdf).repartitionByRange(10, "doc_id")
    commit_append(
        df, tbl, run_id="c1", ok_predicate="doc_id >= 0", stats_cols=["doc_id", "score"]
    )
    return tbl


def test_stats_recorded_per_file(table):
    (m,) = list_manifests(table)
    assert len(m["files"]) == 10
    assert set(m["stats"]) == set(m["files"])
    ranges = sorted(tuple(v["doc_id"]) for v in m["stats"].values())
    # clustered write -> disjoint, covering ranges
    assert ranges[0][0] == 0 and ranges[-1][1] == 999
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi < lo


def test_pruned_read_touches_fewer_files(spark, table):
    full = read_table(spark, table)
    pruned = read_table(spark, table, prune={"doc_id": (100, 150)})
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    # correctness: pruned read + real filter == full read + real filter
    want = sorted(
        r["doc_id"] for r in full.filter("doc_id BETWEEN 100 AND 150").collect()
    )
    got = sorted(
        r["doc_id"] for r in pruned.filter("doc_id BETWEEN 100 AND 150").collect()
    )
    assert got == want == list(range(100, 151))


def test_prune_report_counts(table):
    rep = prune_report(table, {"doc_id": (100, 150)})
    assert rep["n_files"] == 10
    assert rep["n_skipped"] >= 8  # at most 2 files can cover [100,150]
    assert rep["n_read"] == rep["n_files"] - rep["n_skipped"]


def test_open_ended_bounds(spark, table):
    hi_only = read_table(spark, table, prune={"doc_id": (None, 99)})
    assert len(hi_only.inputFiles()) <= 2
    lo_only = read_table(spark, table, prune={"doc_id": (900, None)})
    assert len(lo_only.inputFiles()) <= 2
    assert lo_only.filter("doc_id >= 900").count() == 100


def test_all_files_pruned_returns_empty_with_schema(spark, table):
    out = read_table(spark, table, prune={"doc_id": (5000, 6000)})
    assert out.count() == 0
    assert "extracted_text" in out.columns


def test_unclustered_column_prunes_nothing_but_stays_correct(spark, table):
    # score cycles 0..96 in every file -> every file's range covers the
    # bounds -> nothing skipped, nothing lost
    pruned = read_table(spark, table, prune={"score": (10.0, 20.0)})
    assert len(pruned.inputFiles()) == 10
    assert pruned.filter("score BETWEEN 10 AND 20").count() > 0


def test_stats_less_table_ignores_prune(spark, tmp_path):
    tbl = str(tmp_path / "nostats")
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(20), "extracted_text": ["x"] * 20})
    )
    commit_append(df, tbl, run_id="n1", ok_predicate="doc_id >= 0")
    out = read_table(spark, tbl, prune={"doc_id": (0, 5)})
    assert out.count() == 20  # no stats -> conservative: read everything


def test_extract_job_records_stats(spark, tmp_path):
    from invoice_extraction_spark.corpus import pages_pdf
    from jobs.extract import main

    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(pages_pdf(6)).write.parquet(src)
    tbl = str(tmp_path / "out")
    main(["--source", src, "--table", tbl, "--stats-cols", "url,warc_ts"])
    (m,) = list_manifests(tbl)
    some = next(iter(m["stats"].values()))
    # INT96 timestamps carry no footer min/max (Spark default) — the column
    # is conservatively absent; url (string) stats are recorded
    assert set(some) == {"url"}
    lo, hi = some["url"]
    assert lo.startswith("https://") and lo <= hi


def test_incomparable_prune_bound_keeps_file(spark, table):
    """A type-mismatched bound (int stat vs string bound) must fall back to
    'cannot skip', never crash read planning (ADVICE r3: raw < / > raised
    TypeError)."""
    out = read_table(spark, table, prune={"doc_id": ("abc", "zzz")})
    assert len(out.inputFiles()) == 10  # conservative: nothing skipped
    assert out.count() == 1000


def test_incomparable_prune_unit():
    from invoice_extraction_spark.sources.atomic import _file_survives_prune

    stats = {"doc_id": [0, 99], "ts": ["2024-01-01", "2024-01-31"]}
    # int bound against string stat and vice versa: keep the file
    assert _file_survives_prune(stats, {"ts": (5, 10)})
    assert _file_survives_prune(stats, {"doc_id": ("a", "b")})
    # a comparable column alongside an incomparable one still prunes
    assert not _file_survives_prune(stats, {"doc_id": (500, 600), "ts": (5, 10)})
