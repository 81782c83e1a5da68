"""Sketch-backed incremental datacard (VERDICT r3 #6): each update scans
ONLY unprocessed snapshot deltas (inputFiles-counted), folded card numbers
match a full recompute (additive numbers exactly, quantiles within KLL
bounds, top terms via CMS), compaction snapshots are skipped."""

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.bpe import frozen_bpe_token_count
from invoice_extraction_spark.operators.card_stats import (
    card_from_stats,
    update_card_stats,
)
from invoice_extraction_spark.sources.atomic import (
    commit_append,
    list_manifests,
    read_table,
)


@pytest.fixture()
def table(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    commit_append(docs.filter("doc_id < 200"), tbl, run_id="c1", ok_predicate="doc_id >= 0")
    commit_append(
        docs.filter("doc_id >= 200 AND doc_id < 300"),
        tbl,
        run_id="c2",
        ok_predicate="doc_id >= 0",
    )
    return tbl


def _exact(spark, tbl):
    df = read_table(spark, tbl)
    tot = df.agg(
        F.count("*").alias("d"),
        F.sum(frozen_bpe_token_count()(F.col("text"))).cast("bigint").alias("t"),
        F.sum(F.length("text")).cast("bigint").alias("c"),
    ).collect()[0]
    terms = {
        r["term"]: r["n"]
        for r in df.select(
            F.explode(F.split(F.lower(F.col("text")), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    return tot, terms


def test_incremental_update_scans_only_deltas(spark, table, tmp_path):
    stats = str(tmp_path / "stats")
    upd1 = update_card_stats(spark, table, stats)
    assert upd1["processed"] == ["c1", "c2"]

    # new snapshot -> ONLY its files are scanned
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    commit_append(
        docs.filter("doc_id >= 300 AND doc_id < 350"),
        table,
        run_id="c3",
        ok_predicate="doc_id >= 0",
    )
    upd2 = update_card_stats(spark, table, stats)
    assert upd2["processed"] == ["c3"]
    (m3,) = [m for m in list_manifests(table) if m["run_id"] == "c3"]
    n_table_files = len(read_table(spark, table).inputFiles())
    assert upd2["scanned_files"]["c3"] == len(m3["files"]) < n_table_files

    # idempotent: nothing new -> nothing scanned
    upd3 = update_card_stats(spark, table, stats)
    assert upd3["processed"] == [] and upd3["scanned_files"] == {}


def test_folded_card_matches_full_recompute(spark, table, tmp_path):
    stats = str(tmp_path / "stats")
    update_card_stats(spark, table, stats)
    card = card_from_stats(spark, table, stats, top_k_terms=10)
    tot, terms = _exact(spark, table)

    # additive numbers are EXACT
    assert card["n_docs"] == tot["d"] == 300
    assert card["n_tokens"] == tot["t"]
    assert card["n_chars"] == tot["c"]
    assert sum(e["n_docs"] for e in card["by_language"]) == 300
    assert sum(e["n_tokens"] for e in card["by_language"]) == tot["t"]
    assert {e["value"] for e in card["by_stratum"]} <= {f"src{i}" for i in range(20)}

    # KLL quantiles: ordered, and p50 within rank-error of the exact median
    q = card["token_quantiles"]
    assert q["p10"] <= q["p50"] <= q["p90"] <= q["p99"]
    exact_p50 = (
        read_table(spark, table)
        .select(frozen_bpe_token_count()(F.col("text")).alias("t"))
        .agg(F.expr("percentile(t, 0.45)"), F.expr("percentile(t, 0.55)"))
        .collect()[0]
    )
    assert exact_p50[0] * 0.9 <= q["p50"] <= exact_p50[1] * 1.1

    # top terms: CMS never undercounts; the top-10 set matches exact
    exact_top = sorted(terms.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = {e["term"]: e["est_count"] for e in card["top_terms"]}
    assert set(got) == {t for t, _ in exact_top}
    for t, n in exact_top:
        assert got[t] >= n

    # deterministic fold: regenerating from the same store is identical
    assert card == card_from_stats(spark, table, stats, top_k_terms=10)


def test_compaction_snapshot_skipped(spark, table, tmp_path):
    from invoice_extraction_spark.sources.atomic import compact

    stats = str(tmp_path / "stats")
    update_card_stats(spark, table, stats)
    card_before = card_from_stats(spark, table, stats)
    compact(spark, table, target_files=2)
    upd = update_card_stats(spark, table, stats)
    (cid,) = upd["processed"]
    assert upd["scanned_files"][cid] == 0  # rewrite, not an append
    card_after = card_from_stats(spark, table, stats)
    assert card_after["n_docs"] == card_before["n_docs"]
    assert card_after["n_tokens"] == card_before["n_tokens"]


def test_rollback_orphans_are_pruned_from_fold(spark, table, tmp_path):
    """ADVICE r4 (medium): stats rows for rollback()-archived snapshots must
    not be folded — the card would silently overcount rolled-back docs."""
    from invoice_extraction_spark.sources.atomic import rollback

    stats = str(tmp_path / "stats")
    update_card_stats(spark, table, stats)
    card_full = card_from_stats(spark, table, stats)
    assert card_full["n_docs"] == 300 and card_full["orphaned_snapshots"] == []

    rollback(table, "c1")
    card = card_from_stats(spark, table, stats)
    assert card["n_docs"] == read_table(spark, table).count()
    assert card["n_docs"] < 300
    assert card["orphaned_snapshots"] == ["c2"]
    assert card["snapshots"] == ["c1"]
    # tokens shrink too (not just the doc count)
    assert card["n_tokens"] < card_full["n_tokens"]


def test_bootstrap_from_compaction_base_after_vacuum(spark, table, tmp_path):
    """ADVICE r4 (medium): a FIRST incremental run on a compacted-then-
    vacuumed table must bootstrap from the base instead of crashing on the
    unreadable pre-compaction deltas — and produce exact numbers."""
    from invoice_extraction_spark.sources.atomic import compact, vacuum

    compact(spark, table, target_files=2)
    vacuum(table)
    stats = str(tmp_path / "stats")
    upd = update_card_stats(spark, table, stats)
    # absorbed history marked, base carries the stats
    assert upd["processed"][:2] == ["c1", "c2"]
    assert upd["scanned_files"]["c1"] == 0 and upd["scanned_files"]["c2"] == 0
    base_id = upd["processed"][2]
    assert base_id.startswith("compact-") and upd["scanned_files"][base_id] == 2

    card = card_from_stats(spark, table, stats)
    tot, _terms = _exact(spark, table)
    assert card["n_docs"] == tot["d"] == 300
    assert card["n_tokens"] == tot["t"]
    assert card["n_chars"] == tot["c"]
    # idempotent: nothing left to do
    upd2 = update_card_stats(spark, table, stats)
    assert upd2["processed"] == []


def test_partial_coverage_with_vacuumed_deltas_raises(spark, tmp_path):
    """Mixed state — store covers c1, c2's delta got vacuumed: bootstrapping
    from the base would double-count c1, so the update must refuse with a
    rebuild instruction instead of guessing."""
    from invoice_extraction_spark.sources.atomic import compact, vacuum

    tbl = str(tmp_path / "tbl")
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    commit_append(docs.filter("doc_id < 200"), tbl, run_id="c1", ok_predicate="doc_id >= 0")
    stats = str(tmp_path / "stats")
    update_card_stats(spark, tbl, stats)  # covers c1 only
    commit_append(
        docs.filter("doc_id >= 200 AND doc_id < 300"),
        tbl,
        run_id="c2",
        ok_predicate="doc_id >= 0",
    )
    compact(spark, tbl, target_files=2)
    vacuum(tbl)
    with pytest.raises(ValueError, match="double-count"):
        update_card_stats(spark, tbl, stats)


def test_datacard_job_incremental_mode(spark, table, tmp_path, capsys):
    from jobs.datacard import main

    out = str(tmp_path / "card")
    main(["--table", table, "--out", out, "--incremental"])
    assert "card (incremental)" in capsys.readouterr().out
    import json
    import os

    card = json.load(open(os.path.join(out, "datacard.json")))
    assert card["mode"] == "incremental"
    assert card["n_docs"] == 300 == card["lineage_rows"]
    assert card["top_terms"]
    md = open(os.path.join(out, "DATACARD.md")).read()
    assert "## Top terms" in md
