"""Native session-window streaming (streaming/sessions.py): gap-merge
semantics, exactly-once emission on watermark close, session extension
across micro-batches within a run, and cross-restart state."""

import os

import pandas as pd

from invoice_extraction_spark.streaming.sessions import session_host_stats

T0 = "2021-03-01 10:"


def _write_events(spark, src, name, rows):
    pdf = pd.DataFrame(rows, columns=["host", "url", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    df = spark.createDataFrame(pdf).selectExpr(
        "host", "url", "CAST(ts AS TIMESTAMP) AS ts"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(src, name))


def _run(spark, base):
    session_host_stats(
        spark,
        source_dir=f"{base}/src/*",
        out_dir=f"{base}/out",
        checkpoint_dir=f"{base}/ckpt",
        gap="10 minutes",
        watermark="5 minutes",
    )


def _read_out(spark, base):
    try:
        rows = spark.read.parquet(f"{base}/out").collect()
    except Exception:
        return {}
    return {
        (r["host"], str(r["sess_start"])[11:16]): (
            str(r["sess_end"])[11:16],
            r["n_events"],
        )
        for r in rows
    }


def test_gap_merge_and_exactly_once(spark, tmp_path):
    base = str(tmp_path)
    # host a: two bursts separated by > gap -> two sessions;
    # host b: events 9 min apart (< 10 min gap) -> ONE session
    _write_events(
        spark,
        f"{base}/src",
        "b0",
        [
            ("a", "u1", f"{T0}00:00"),
            ("a", "u2", f"{T0}02:00"),
            ("a", "u3", f"{T0}30:00"),
            ("b", "u4", f"{T0}00:00"),
            ("b", "u5", f"{T0}09:00"),
        ],
    )
    # advance the watermark far past everything so all sessions close
    _write_events(spark, f"{base}/src", "b1", [("w", "x", f"{T0}59:00")])
    _run(spark, base)
    out = _read_out(spark, base)
    # a: [00:00, 12:00) and [30:00, 40:00); b: one merged [00:00, 19:00)
    assert out[("a", "10:00")] == ("10:12", 2)
    assert out[("a", "10:30")] == ("10:40", 1)
    assert out[("b", "10:00")] == ("10:19", 2)

    # re-run with no new data: nothing re-emits (exactly-once via checkpoint)
    before = len(out)
    _run(spark, base)
    assert len(_read_out(spark, base)) == before


def test_session_extends_across_restarts(spark, tmp_path):
    base = str(tmp_path)
    _write_events(spark, f"{base}/src", "b0", [("a", "u1", f"{T0}00:00")])
    _run(spark, base)
    assert _read_out(spark, base) == {}  # watermark hasn't closed anything

    # a second RUN (restart from checkpoint) extends the still-open session
    _write_events(spark, f"{base}/src", "b1", [("a", "u2", f"{T0}08:00")])
    _run(spark, base)
    assert _read_out(spark, base) == {}  # still open: watermark at 08:00-5m

    # third run: advance watermark past session end -> ONE merged session
    _write_events(spark, f"{base}/src", "b2", [("w", "x", f"{T0}45:00")])
    _run(spark, base)
    out = _read_out(spark, base)
    assert out[("a", "10:00")] == ("10:18", 2)  # extended by the restart
