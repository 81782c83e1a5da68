"""Per-domain quota tier (functions/urls.py::domain_quota_incremental +
the curate stream / batch job wiring): committed history always counts
first, within-batch selection is the same deterministic md5(url) rank as
the batch operator, replays are idempotent, an orphan delta from a
crashed attempt never shrinks its own batch's quota, and the quota index
compacts with the others."""

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.urls import domain_quota_incremental
from invoice_extraction_spark.sources.atomic import read_table
from invoice_extraction_spark.streaming.curate_stream import (
    index_dirs,
    run_curate_stream,
)
from invoice_extraction_spark.streaming.seq_index import (
    load_rows,
    n_seq_partitions,
)

TEXTS = {
    "http://a.com/1": "alpha beta gamma delta epsilon one",
    "http://a.com/2": "alpha beta gamma delta epsilon two",
    "http://a.com/3": "alpha beta gamma delta epsilon three",
    "http://a.com/4": "alpha beta gamma delta epsilon four",
    "http://b.com/1": "totally different words about bridges",
    "http://b.com/2": "totally different words about tunnels",
}


def _write_batch(spark, src, urls):
    spark.createDataFrame(
        pd.DataFrame([(u, TEXTS[u]) for u in urls], columns=["url", "text"])
    ).coalesce(1).write.mode("append").parquet(src)


def _dirs(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "tbl"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )


def _urls(spark, tbl):
    return {r["url"] for r in read_table(spark, tbl).collect()}


def test_operator_history_wins_and_delta(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [(u, TEXTS[u]) for u in ("http://a.com/3", "http://a.com/4",
                                     "http://b.com/1")],
            columns=["url", "text"],
        )
    )
    counts = spark.createDataFrame(
        pd.DataFrame([("a.com", 2)], columns=["domain", "n"])
    )
    kept, delta = domain_quota_incremental(df, counts, max_per_domain=3)
    got = {r["url"] for r in kept.collect()}
    # history holds 2 of a.com's quota of 3: exactly one batch doc survives,
    # the md5-rank winner (the batch operator's determinism contract)
    winner = min(
        ("http://a.com/3", "http://a.com/4"),
        key=lambda u: hashlib.md5(u.encode()).hexdigest(),
    )
    assert got == {winner, "http://b.com/1"}
    d = {r["domain"]: r["n"] for r in delta.collect()}
    assert d == {"a.com": 1, "b.com": 1}
    # no counts index yet -> pure within-batch cap
    kept0, delta0 = domain_quota_incremental(df, None, max_per_domain=1)
    assert {r["url"] for r in kept0.collect()} == {winner, "http://b.com/1"}
    assert {r["domain"]: r["n"] for r in delta0.collect()} == {
        "a.com": 1,
        "b.com": 1,
    }
    # internal columns never leak, caller columns survive
    assert set(kept.columns) == {"url", "text"}


def test_stream_cross_batch_quota(spark, tmp_path):
    dirs = src, tbl, idx, ckpt = _dirs(tmp_path)
    _write_batch(spark, src, ["http://a.com/1", "http://a.com/2",
                              "http://b.com/1"])
    run_curate_stream(spark, src, tbl, idx, ckpt, max_per_domain=3)
    _write_batch(spark, src, ["http://a.com/3", "http://a.com/4",
                              "http://b.com/2"])
    run_curate_stream(spark, src, tbl, idx, ckpt, max_per_domain=3)

    got = _urls(spark, tbl)
    winner = min(
        ("http://a.com/3", "http://a.com/4"),
        key=lambda u: hashlib.md5(u.encode()).hexdigest(),
    )
    # batch-1 commits are NEVER displaced (history wins), batch 2 gets the
    # single remaining a.com slot
    assert got == {
        "http://a.com/1", "http://a.com/2", "http://b.com/1",
        winner, "http://b.com/2",
    }
    # quota index = committed corpus, summed per domain
    q = load_rows(spark, index_dirs(idx)["quota"])
    sums = {
        r["domain"]: r["n"]
        for r in q.groupBy("domain").agg(F.sum("n").alias("n")).collect()
    }
    assert sums == {"a.com": 3, "b.com": 2}

    # replay with the same checkpoint: table and index unchanged
    before = q.count()
    run_curate_stream(spark, src, tbl, idx, ckpt, max_per_domain=3)
    assert _urls(spark, tbl) == got
    assert load_rows(spark, index_dirs(idx)["quota"]).count() == before


def test_orphan_quota_delta_does_not_shrink_own_batch(spark, tmp_path):
    """Crash between the delta write and the commit: the replayed batch
    probes only seq < batch_id, so the orphan cannot count against the
    batch that produced it."""
    dirs = src, tbl, idx, ckpt = _dirs(tmp_path)
    _write_batch(spark, src, ["http://b.com/1"])
    run_curate_stream(spark, src, tbl, idx, ckpt, max_per_domain=2)

    _write_batch(spark, src, ["http://a.com/1", "http://a.com/2"])
    # hand-plant the delta a dead prior attempt at batch 1 would have left
    spark.createDataFrame(
        pd.DataFrame([("a.com", 2)], columns=["domain", "n"])
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{index_dirs(idx)['quota']}/seq=1"
    )
    run_curate_stream(spark, src, tbl, idx, ckpt, max_per_domain=2)
    got = _urls(spark, tbl)
    assert {"http://a.com/1", "http://a.com/2"} <= got


def test_quota_after_dedup_and_compaction_cadence(spark, tmp_path):
    """A duplicate never consumes quota (exact tier runs first), and the
    quota index joins the compaction cadence."""
    dirs = src, tbl, idx, ckpt = _dirs(tmp_path)
    # a.com/2 duplicates a.com/1's text -> drops in the exact tier, so
    # a.com/3 still fits under quota 2
    dup = dict(TEXTS)
    rows = [
        ("http://a.com/1", TEXTS["http://a.com/1"]),
        ("http://a.com/2", TEXTS["http://a.com/1"]),
        ("http://a.com/3", TEXTS["http://a.com/3"]),
    ]
    spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "text"])
    ).coalesce(1).write.mode("append").parquet(src)
    _write_batch(spark, src, ["http://b.com/1"])
    run_curate_stream(
        spark, src, tbl, idx, ckpt,
        exact=True, max_per_domain=2, max_files_per_trigger=1,
        compact_every=2, stats=True,
    )
    got = _urls(spark, tbl)
    survivor = min(("http://a.com/1", "http://a.com/2"),
                   key=lambda u: hashlib.md5(u.encode()).hexdigest())
    # exact dedup keeps the lowest-md5 url of the pair; quota then admits
    # the survivor plus a.com/3
    assert got == {survivor, "http://a.com/3", "http://b.com/1"}
    assert n_seq_partitions(index_dirs(idx)["quota"]) == 1
    # retention stats include the quota stage
    stats = load_rows(spark, f"{idx}/stats")
    stages = {r["stage"] for r in stats.collect()}
    assert "quota" in stages


def test_batch_cli_max_per_domain(spark, tmp_path):
    from jobs.curate import main

    src, tbl = str(tmp_path / "src"), str(tmp_path / "tbl")
    spark.createDataFrame(
        pd.DataFrame(
            [(u, TEXTS[u]) for u in TEXTS], columns=["url", "text"]
        )
    ).write.parquet(src)
    main([
        "--source", src, "--table", tbl, "--id-col", "url",
        "--max-per-domain", "2",
    ])
    got = read_table(spark, tbl).select("url").collect()
    domains = {}
    for r in got:
        d = r["url"].split("/")[2].removeprefix("www.")
        domains[d] = domains.get(d, 0) + 1
    assert domains == {"a.com": 2, "b.com": 2}
