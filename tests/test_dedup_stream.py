"""Streaming incremental dedup: cross-batch near-dups dropped via the
persisted band index (history text never re-read), within-batch exact dups
dropped, checkpoint replay is a no-op, and heal_index recovers the
crash window between survivor commit and index append."""

import os

import pandas as pd

from invoice_extraction_spark.sources.atomic import read_table
from invoice_extraction_spark.streaming.dedup_stream import heal_index, run_dedup_stream

BASE = "the quick brown fox jumps over the lazy dog near the river bank today"


def _write_batch(spark, src, name, rows):
    spark.createDataFrame(pd.DataFrame(rows, columns=["url", "text"])).coalesce(
        1
    ).write.mode("append").parquet(src)
    # file source picks up whatever is new on the next trigger


def _dirs(tmp_path):
    return (
        str(tmp_path / "src"),
        str(tmp_path / "tbl"),
        str(tmp_path / "idx"),
        str(tmp_path / "ckpt"),
    )


def test_cross_batch_near_dup_dropped_and_replay_idempotent(spark, tmp_path):
    src, tbl, idx, ckpt = _dirs(tmp_path)
    _write_batch(
        spark,
        src,
        "b0",
        [("u0", BASE), ("u1", BASE), ("u2", "totally unrelated words about satellites")],
    )
    run_dedup_stream(spark, src, tbl, idx, ckpt)
    got = sorted(r["url"] for r in read_table(spark, tbl).collect())
    assert got == ["u0", "u2"]  # u1 = within-batch exact dup of u0

    # batch 2: one near-dup of history (one-word change) + one new doc
    _write_batch(
        spark,
        src,
        "b1",
        [("u3", BASE.replace("today", "tonight")), ("u4", "fresh content entirely")],
    )
    run_dedup_stream(spark, src, tbl, idx, ckpt)
    got = sorted(r["url"] for r in read_table(spark, tbl).collect())
    assert got == ["u0", "u2", "u4"]  # u3 collided with u0's bands

    # re-running with the same checkpoint is a full no-op (nothing new)
    run_dedup_stream(spark, src, tbl, idx, ckpt)
    assert sorted(r["url"] for r in read_table(spark, tbl).collect()) == got
    # index holds band rows for exactly the survivors
    ids = {r["id"] for r in spark.read.parquet(idx).collect()}
    assert ids == {"u0", "u2", "u4"}


def test_stream_start_heals_crash_window(spark, tmp_path):
    """Crash between commit_append and the index append: the committed docs
    are missing from the band index. The NEXT run_dedup_stream call must
    heal the index before draining new batches, so future near-dups of the
    lost documents are still caught (ADVICE r3: run_dedup_stream never
    called heal_index)."""
    import shutil

    src, tbl, idx, ckpt = _dirs(tmp_path)
    _write_batch(spark, src, "b0", [("u0", BASE), ("u2", "other words here")])
    run_dedup_stream(spark, src, tbl, idx, ckpt)
    # simulate dying right after the survivor commit: index rows lost
    shutil.rmtree(idx)

    # next stream start drains a near-dup of the lost u0
    _write_batch(spark, src, "b1", [("u3", BASE.replace("today", "tonight"))])
    run_dedup_stream(spark, src, tbl, idx, ckpt)
    got = sorted(r["url"] for r in read_table(spark, tbl).collect())
    assert got == ["u0", "u2"]  # u3 caught ONLY because the start healed
    ids = {r["id"] for r in spark.read.parquet(idx).collect()}
    assert ids == {"u0", "u2"}


def test_heal_index_recovers_missing_rows(spark, tmp_path):
    src, tbl, idx, ckpt = _dirs(tmp_path)
    _write_batch(spark, src, "b0", [("u0", BASE), ("u2", "other words here")])
    run_dedup_stream(spark, src, tbl, idx, ckpt)

    # simulate the crash window: drop the index entirely
    import shutil

    shutil.rmtree(idx)
    healed = heal_index(spark, tbl, idx)
    assert healed == 2
    ids = {r["id"] for r in spark.read.parquet(idx).collect()}
    assert ids == {"u0", "u2"}
    assert heal_index(spark, tbl, idx) == 0  # idempotent
