"""Shared protocol for seq-partitioned streaming indexes.

Every incremental-dedup stream persists its cross-batch state as an
append-only directory of per-batch parquet partitions ``seq=<batch_id>/``:
the sink writes the batch's delta partition FIRST (an idempotent overwrite
keyed by batch id — a replayed batch regenerates byte-equal content into
its own directory), then commits survivors through the atomic manifest.
Probes fold only ``seq < batch_id`` partitions, so a replayed batch can
never observe its own delta. That protocol ELIMINATES the commit->index
crash window instead of healing it (`span_dedup_stream.py` module
docstring has the full argument); this module holds the pieces every such
index shares:

- ``recover_compaction`` / ``index_files`` / ``n_seq_partitions``:
  directory state, including healing an interrupted compaction swap.
- ``load_rows``: the UNION-semantics logical view (fingerprints, band
  rows, bucket memberships — facts that accumulate). Fold-semantics
  indexes (the span-gram counts) keep their own load on top of the same
  directory helpers.
- ``compact_rows``: fold the per-batch partitions back to a single one
  tagged with the max seq, via the marker-protected directory swap:

  1. write the consolidated rows to ``<index>.compact.tmp/seq=<max>``
  2. rename the live dir aside (atomic)
  3. rename tmp into place (atomic)
  4. remove the old dir

  A crash after (2) is healed by ``recover_compaction`` (tmp is complete
  before (2) ever runs); a crash before (2) leaves the live dir untouched
  and a stale tmp the next compaction overwrites. The max-seq tag keeps
  every future ``before_seq`` probe including the compacted history.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def n_seq_partitions(index_dir: str) -> int:
    if not os.path.isdir(index_dir):
        return 0
    return sum(1 for d in os.listdir(index_dir) if d.startswith("seq="))


def index_files(index_dir: str) -> bool:
    return os.path.isdir(index_dir) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(index_dir) for f in fs
    )


def recover_compaction(index_dir: str) -> None:
    """Finish a compaction interrupted between the two directory renames:
    the consolidated tmp dir is complete by construction once the live dir
    has been moved aside, so promoting it is always safe."""
    tmp = index_dir + ".compact.tmp"
    if not os.path.isdir(index_dir) and os.path.isdir(tmp):
        os.rename(tmp, index_dir)
    old = index_dir + ".compact.old"
    if os.path.isdir(index_dir) and os.path.isdir(old):
        shutil.rmtree(old)


def load_rows(
    spark: SparkSession, index_dir: str, before_seq: int | None = None
) -> DataFrame | None:
    """The union-semantics logical index: every per-batch partition's rows,
    ``seq`` dropped. ``before_seq`` excludes this batch's own partition
    during a replay (partition-pruned). None when no index exists yet."""
    recover_compaction(index_dir)
    if not index_files(index_dir):
        return None
    df = spark.read.option("basePath", index_dir).parquet(index_dir)
    if before_seq is not None:
        df = df.filter(F.col("seq") < before_seq)  # partition-pruned
    return df.drop("seq")


def compact_rows(spark: SparkSession, index_dir: str) -> int:
    """Consolidate every per-batch partition of a union-semantics index
    into a single one tagged with the max seq (rows unchanged). Returns
    the number of partitions consolidated."""
    recover_compaction(index_dir)
    if not index_files(index_dir):
        return 0
    df = spark.read.option("basePath", index_dir).parquet(index_dir)
    seqs = [r["seq"] for r in df.select("seq").distinct().collect()]
    if len(seqs) <= 1:
        return len(seqs)
    rows = df.drop("seq")
    tmp = index_dir + ".compact.tmp"
    old = index_dir + ".compact.old"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    rows.write.mode("overwrite").parquet(f"{tmp}/seq={max(seqs)}")
    os.rename(index_dir, old)
    os.rename(tmp, index_dir)
    shutil.rmtree(old)
    return len(seqs)
