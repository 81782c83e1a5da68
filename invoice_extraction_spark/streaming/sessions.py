"""Session-window streaming aggregation (native ``session_window``).

The batch engine sessionizes with a lag-gap window (q:user_sessions); the
streaming twin uses Structured Streaming's native session windows: per-key
windows that EXTEND while events keep arriving within the gap and close
only when the watermark passes (last_event + gap). Unlike tumbling windows
(streaming/windowed.py), session bounds are data-driven — exactly the
crawl-politeness / user-activity shape: "how long did this host keep
getting fetched, in bursts separated by >= gap".

State: one open window per active key, merged as events arrive (the state
store holds (key, window) pairs; Spark merges overlapping sessions on
update). The watermark bounds both lateness AND state size — a session
can only stay open while events newer than (watermark - gap) can still
arrive. Append mode emits each session exactly once, when it can no
longer grow — the contract an atomic downstream sink wants.

All of this is JVM-side streaming state machinery; no Python runs per
event.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .windowed import EVENT_SCHEMA


def session_host_stats(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "10 minutes",
    watermark: str = "5 minutes",
) -> None:
    """Per-host activity sessions: events within ``gap`` of each other merge
    into one session; each closed session lands once in ``out_dir`` with its
    bounds, event count, and distinct-url count."""
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("sess"), "host")
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("url").alias("n_urls"),
        )
        .select(
            F.col("sess.start").alias("sess_start"),
            F.col("sess.end").alias("sess_end"),
            "host",
            "n_events",
            "n_urls",
        )
    )

    def _sink(batch_df, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
