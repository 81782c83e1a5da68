"""Custom stateful streaming operator: per-host incremental crawl stats.

Task-brief item ("applyInPandasWithState for custom stateful operators").
Maintains per-host running (n_pages, n_bytes) across micro-batches AND across
separate AvailableNow runs — the state store lives in the checkpoint, so a
crawler feeding page drops gets monotone per-host counters with exactly-once
semantics, no external store.

Scale shape: state is keyed by host (bounded cardinality), the shuffle is the
groupBy(host) hash exchange, and each group's Arrow batches stream through
the update function — the same plan Structured Streaming uses for
flatMapGroupsWithState on the JVM side.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from .incremental import PAGES_SCHEMA

OUTPUT_SCHEMA = "host STRING, n_pages LONG, n_bytes LONG"
STATE_SCHEMA = "n LONG, b LONG"


def _update_host_stats(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, b = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        b += int(sum(len(x or b"") for x in pdf["html"]))
    state.update((n, b))
    yield pd.DataFrame({"host": [key[0]], "n_pages": [n], "n_bytes": [b]})


def run_host_stats(
    spark: SparkSession,
    source_dir: str,
    checkpoint_dir: str,
    stats_dir: str,
) -> DataFrame:
    """Process all new corpus files, updating per-host running stats.

    Update rows land in ``stats_dir`` (parquet, appended per batch via
    foreachBatch — the memory sink can't recover from a checkpoint); current
    totals = max per host, since counters are monotone.
    """
    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .parquet(source_dir)
    )
    keyed = stream.withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1)
    ).groupBy("host")
    updates = keyed.applyInPandasWithState(
        _update_host_stats,
        OUTPUT_SCHEMA,
        STATE_SCHEMA,
        "update",
        GroupStateTimeout.NoTimeout,
    )

    def _sink(batch_df, _batch_id: int) -> None:
        batch_df.write.mode("append").parquet(stats_dir)

    q = (
        updates.writeStream.foreachBatch(_sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(stats_dir)
        .groupBy("host")
        .agg(F.max("n_pages").alias("n_pages"), F.max("n_bytes").alias("n_bytes"))
    )
