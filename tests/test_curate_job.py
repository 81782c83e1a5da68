"""jobs/curate.py end-to-end: the full curation chain over a corpus with
planted duplicates and benchmark contamination, committed atomically."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.sources.atomic import read_table


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("curate")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    # plant an exact duplicate pair (doc 9001 == doc 5's text) and keep it
    # non-empty so the dup survives the quality gate to be caught by dedup
    src = docs.filter("length(text) > 50")
    dup = src.filter("doc_id = 5").withColumn("doc_id", F.lit(9001))
    out = str(base / "docs.parquet")
    src.unionByName(dup).write.parquet(out)
    return out


@pytest.fixture(scope="module")
def bench_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bench")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(base / "bench.parquet")
    docs.filter("doc_id = 17").select("text").write.parquet(out)
    return out


def test_curate_chain(spark, corpus_dir, bench_dir, tmp_path, capsys):
    from jobs.curate import main

    tbl = str(tmp_path / "curated")
    main(
        [
            "--source", corpus_dir,
            "--table", tbl,
            "--exact-dedup",
            "--min-quality", "0.05",
            "--repetition-gate",
            "--bench", bench_dir,
            "--mixture", "src0=0.5",
            "--pack-budget", "256",
        ]
    )
    printed = capsys.readouterr().out
    assert "stage input:" in printed and "committed run_id=" in printed

    got = read_table(spark, tbl)
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    # exact dedup kept ONE of the planted pair (min id wins)
    assert 5 in ids and 9001 not in ids
    # decontamination dropped the benchmark-verbatim doc
    assert 17 not in ids
    # packing columns landed
    assert {"pack_id", "pack_seq", "pack_offset", "n_tokens"} <= set(got.columns)
    # packs respect the greedy-overflow invariant: offset < budget always
    assert got.filter("pack_offset >= 256").count() == 0
    # mixture applied to src0 only: fewer src0 docs than input, others intact
    src_counts = {
        r["source"]: r["n"]
        for r in got.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    in_counts = {
        r["source"]: r["n"]
        for r in spark.read.parquet(corpus_dir)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert src_counts.get("src0", 0) < in_counts["src0"]


def test_stage_counts_monotone(spark, corpus_dir, tmp_path, capsys):
    from jobs.curate import main

    tbl = str(tmp_path / "curated2")
    main(
        [
            "--source", corpus_dir,
            "--table", tbl,
            "--exact-dedup",
            "--near-dedup",
            "--min-quality", "0.05",
        ]
    )
    printed = capsys.readouterr().out
    counts = [
        int(line.split(":")[1].split()[0])
        for line in printed.splitlines()
        if line.startswith("stage ")
    ]
    assert len(counts) == 4  # input, exact, near, quality
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert counts[0] > counts[1]  # the planted dup actually fell out


def test_line_dedup_stage(spark, tmp_path, capsys):
    """--line-dedup rewrites text, removing corpus-wide chrome lines."""
    import pandas as pd

    from jobs.curate import main

    chrome = "Accept cookies to continue"
    rows = [(i, f"{chrome}\nunique paragraph {i} words here") for i in range(5)]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).write.parquet(src)

    tbl = str(tmp_path / "curated")
    main(["--source", src, "--table", tbl, "--line-dedup", "3", "--no-counts"])
    capsys.readouterr()
    got = {r["doc_id"]: r["text"] for r in read_table(spark, tbl).collect()}
    assert len(got) == 5
    assert all(chrome not in t for t in got.values())
    assert got[2] == "unique paragraph 2 words here"


def test_fix_text_stage(spark, tmp_path, capsys):
    """--fix-text repairs mojibake before the quality gates."""
    import pandas as pd

    from jobs.curate import main

    rows = [(1, "CafÃ© rÃ©sumÃ© needs fixing here"), (2, "already clean words here")]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"])).write.parquet(src)
    tbl = str(tmp_path / "out")
    main(["--source", src, "--table", tbl, "--fix-text", "--no-counts"])
    capsys.readouterr()
    got = {r["doc_id"]: r["text"] for r in read_table(spark, tbl).collect()}
    assert got[1] == "Café résumé needs fixing here"
    assert got[2] == "already clean words here"
