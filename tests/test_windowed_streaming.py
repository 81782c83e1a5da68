"""Watermark + windowed-agg semantics (streaming/windowed.py): windows emit
exactly once when the watermark passes; late-but-in-window events within the
delay are counted; events older than the watermark are dropped — across
checkpointed job restarts, not just within one run."""

import os

import pandas as pd

from invoice_extraction_spark.streaming.windowed import windowed_host_counts

T0 = "2021-03-01 10:"


def _write_events(spark, src, name, rows):
    pdf = pd.DataFrame(rows, columns=["host", "url", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    df = spark.createDataFrame(pdf).selectExpr(
        "host", "url", "CAST(ts AS TIMESTAMP) AS ts"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))


def _run(spark, base):
    windowed_host_counts(
        spark,
        source_dir=f"{base}/src/*",
        out_dir=f"{base}/out",
        checkpoint_dir=f"{base}/ckpt",
    )


def _read_out(spark, base):
    try:
        rows = spark.read.parquet(f"{base}/out").collect()
    except Exception:
        return {}
    return {
        (str(r["win_start"])[11:16], r["host"]): r["n_events"] for r in rows
    }


def test_watermarked_windows_emit_once_and_drop_too_late(spark, tmp_path):
    base = str(tmp_path)
    src = f"{base}/src"

    # run 1: events in the [10:00, 10:10) window — watermark (max 10:05 - 5m
    # = 10:00) has not passed the window end, so nothing is emitted yet
    _write_events(
        spark, src, "f1",
        [("a", "u1", T0 + "00:00"), ("a", "u2", T0 + "05:00"), ("b", "u3", T0 + "02:00")],
    )
    _run(spark, base)
    assert _read_out(spark, base) == {}

    # run 2: event at 10:30 advances the watermark to 10:25; availableNow's
    # trailing no-data batch then evicts the finalized [10:00, 10:10) window
    # within the SAME run
    _write_events(spark, src, "f2", [("a", "u4", T0 + "30:00")])
    _run(spark, base)
    got = _read_out(spark, base)
    assert got == {("10:00", "a"): 2, ("10:00", "b"): 1}

    # run 3: a LATE event at 10:07 — older than the checkpointed watermark
    # (10:25) AND targeting an already-finalized window — must be DROPPED:
    # no new rows, no re-emit, no double count. 10:40 advances the watermark
    # to 10:35, which does NOT yet finalize [10:30, 10:40).
    _write_events(
        spark, src, "f3", [("a", "late", T0 + "07:00"), ("a", "u5", T0 + "40:00")]
    )
    _run(spark, base)
    got = _read_out(spark, base)
    assert got == {("10:00", "a"): 2, ("10:00", "b"): 1}

    # run 4: 10:50 pushes the watermark to 10:45 — [10:30, 10:40) finalizes
    # with exactly its one event (u5@10:40 belongs to the NEXT window, still
    # open); earlier windows never re-emit
    _write_events(spark, src, "f4", [("a", "u6", T0 + "50:00")])
    _run(spark, base)
    got = _read_out(spark, base)
    assert got[("10:30", "a")] == 1
    assert got[("10:00", "a")] == 2 and got[("10:00", "b")] == 1
    assert len(got) == 3  # emit-once: no duplicates, nothing else finalized
