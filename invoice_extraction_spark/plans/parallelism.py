"""Guarantee minimum physical parallelism ahead of expensive per-row
kernels (Arrow pandas UDFs, interpreted higher-order-function folds).

Why this exists: Spark splits parquet FILES into tasks by byte ranges,
but rows are assigned to a task only if their row group's midpoint falls
inside the task's range. A small table written as one file with one row
group therefore scans as ONE task no matter how many cores (or
executors) exist — and every downstream per-row kernel in the same stage
runs serially. Measured here: the sf1 LSH band-members stage ran 2-task
on 32 cores, 23.8 s; the MinHash kernel itself costs ~1.3 s at full
parallelism.

The fix mirrors the extraction pipeline's contractual explicit
repartition (`operators/extract.py`): pay ONE small shuffle to guarantee
kernel parallelism — but only when the scan is actually starved. At
production scale (100 TB = thousands of files/splits) the partition
count already exceeds the session's parallelism and this is a literal
no-op: zero added shuffle, plan unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` to ``target`` partitions ONLY if its
    physical plan currently has fewer; pass streaming frames through
    untouched (micro-batch sizing is the stream's concern).

    ``target`` defaults to the session's default parallelism (= local[N]'s
    N, or the cluster's total cores). Checking costs one physical-plan
    conversion (no job); at scale the check is the entire cost.
    """
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = target or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
