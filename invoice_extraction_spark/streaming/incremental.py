"""Incremental extraction via Structured Streaming (SURVEY.md §2.9 stretch).

The reference is strictly batch; the north rule asks for *resumability*, which
``sources/atomic.py`` provides. This module adds the idiomatic-Spark
incremental path on top: a file-source stream with ``Trigger.AvailableNow``
processes whatever new corpus files have landed since the last checkpoint,
then stops — giving checkpointed, exactly-once incremental runs with zero
bookkeeping code of our own.

At production scale the source would be an Iceberg table stream (or WARC
drops on object storage); the checkpoint + foreachBatch-commit pattern is
identical.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..operators.extract import extract_pages
from ..sources.atomic import commit_append, list_manifests

PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
    ]
)


def run_incremental(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    checkpoint_dir: str,
    num_partitions: int | None = None,
) -> None:
    """Process all not-yet-seen corpus parquet files, commit atomically, stop.

    Each micro-batch runs the full extraction pipeline and lands as one
    atomic snapshot (manifest) — a failed batch leaves no partial output and
    the checkpoint replays it.
    """

    def _sink(batch_df, batch_id: int) -> None:
        run_id = f"stream-{batch_id}"
        # Idempotent under foreachBatch replay: if the driver died AFTER the
        # manifest rename published but BEFORE the streaming checkpoint
        # recorded the batch, restart re-delivers the same batch_id — the
        # commit must be a no-op or every row duplicates (data dirs are
        # deliberately unique per commit). run_id == batch_id is the
        # standard foreachBatch exactly-once recipe.
        if any(m["run_id"] == run_id for m in list_manifests(table_dir)):
            return
        out = extract_pages(batch_df, num_partitions=num_partitions)
        commit_append(out, table_dir, run_id=run_id)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
