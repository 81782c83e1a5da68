"""Streaming incremental dedup — the daily-batch LSH pattern as a
Structured Streaming job (the capstone tying §2.9 streaming to the dedup
family).

Each micro-batch of new documents is deduplicated against the PERSISTED
corpus band index (``dedup.band_index`` rows accumulated from every prior
batch), then the survivors' band rows extend the index for the next batch.
Historical document TEXT is never read — only the tiny (band, id) index —
so a 10^12-doc corpus dedups each day's drop at cost proportional to the
drop plus the index, exactly like the batch ``dedup_incremental``.

Exactly-once: survivors land through ``commit_append``'s atomic manifests
keyed by batch id (the foreachBatch replay recipe of
``streaming/incremental.py``), and the index append for a batch is skipped
whenever the survivor commit for that batch already exists — index and
table can never diverge by more than a replayed no-op.

Within-batch duplicates are handled by ``dedup_exact`` + (optionally small)
``dedup_near`` on the batch alone before the index probe; cross-batch
near-dups are caught by the index.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..operators.dedup import band_index, dedup_exact, dedup_incremental
from ..sources.atomic import commit_append, list_manifests
from .incremental import PAGES_SCHEMA  # noqa: F401  (re-export for callers)


def run_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    table_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    schema=None,
    text_col: str = "text",
    id_col: str = "url",
    num_bands: int = 4,
    rows_per_band: int = 2,
) -> None:
    """Drain all unseen source parquet files (Trigger.AvailableNow):
    per batch — exact dedup within the batch, band-probe against the
    persisted index, commit survivors atomically, extend the index with the
    survivors' band rows."""
    from pyspark.sql import types as T

    schema = schema or T.StructType(
        [
            T.StructField(id_col, T.StringType(), False),
            T.StructField(text_col, T.StringType()),
        ]
    )

    # Heal FIRST: if a prior run died between commit_append and the index
    # append, the replay guard below would skip the batch and the index
    # would permanently miss those documents. Re-derive the missing band
    # rows from the committed table before draining new batches.
    if list_manifests(table_dir):
        heal_index(
            spark,
            table_dir,
            index_dir,
            text_col=text_col,
            id_col=id_col,
            num_bands=num_bands,
            rows_per_band=rows_per_band,
        )

    def _sink(batch_df, batch_id: int) -> None:
        run_id = f"dedup-{batch_id}"
        if any(m["run_id"] == run_id for m in list_manifests(table_dir)):
            return  # replayed batch: survivors already landed; index healed above
        batch = dedup_exact(batch_df, text_col=text_col, id_col=id_col)
        if os.path.isdir(index_dir) and any(
            f.endswith(".parquet")
            for _r, _d, fs in os.walk(index_dir)
            for f in fs
        ):
            index = batch_df.sparkSession.read.parquet(index_dir)
            kept = dedup_incremental(
                batch, index, text_col, id_col, num_bands, rows_per_band
            )
        else:
            kept = batch  # first batch: nothing to collide with
        # both sink actions (commit, index append) derive from the dedup
        # chain — cache the survivors for the batch's life
        from pyspark import StorageLevel

        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # survivors commit FIRST (atomic manifest). If we die between
            # this and the index append, the replay guard above skips the
            # batch and the missing index rows are re-derived below from
            # the table itself on the next stream start (heal_index).
            commit_append(
                kept,
                table_dir,
                run_id=run_id,
                ok_predicate=f"{text_col} IS NOT NULL",
            )
            kept_bands = band_index(
                kept, text_col, id_col, num_bands, rows_per_band
            )
            kept_bands.write.mode("append").parquet(index_dir)
        finally:
            kept.unpersist()

    (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def heal_index(
    spark: SparkSession,
    table_dir: str,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "url",
    num_bands: int = 4,
    rows_per_band: int = 2,
) -> int:
    """Recover index rows for committed docs missing from the index (the
    crash window between survivor commit and index append). Anti-join on the
    id keeps the rebuild proportional to the missing slice. Returns the
    number of healed documents."""
    from pyspark.sql import functions as F

    from ..sources.atomic import read_table

    docs = read_table(spark, table_dir).select(id_col, text_col)
    if os.path.isdir(index_dir) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(index_dir) for f in fs
    ):
        have = spark.read.parquet(index_dir).select(F.col("id").alias(id_col)).distinct()
        missing = docs.join(have, id_col, "left_anti")
    else:
        missing = docs
    n = missing.count()
    if n:
        band_index(missing, text_col, id_col, num_bands, rows_per_band).write.mode(
            "append"
        ).parquet(index_dir)
    return n
