"""Training-data export job — the sink side of the curation pipeline.

    spark-submit --py-files <pkg.zip> jobs/export.py \
        --table /path/to/curated_table --out /path/to/export \
        [--format jsonl|parquet] [--columns url,text,pack_id] \
        [--shard-by pack_id] [--shards 64] [--max-records-per-file 100000] \
        [--compress gzip]

Loaders want stable, bounded shards: deterministic membership (a re-export
produces the same shard contents — resumable downloads, cacheable
preprocessing), bounded file sizes (``maxRecordsPerFile`` splits hot
shards), and a self-describing layout. Sharding is
``repartitionByRange(shards, shard_by) + sortWithinPartitions(shard_by)``:
range partitioning gives contiguous key ranges per shard (locality for
pack-addressed reads) and the within-shard sort makes file CONTENTS
deterministic, not just membership — byte-stable apart from compression
container metadata.

JSONL is the lingua franca of training loaders; parquet passes through for
Spark/Arrow consumers. Everything is a plain DataFrame write — cluster
parallel, no driver bottleneck.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="curated table dir (atomic snapshots)")
    ap.add_argument("--out", required=True, help="export directory")
    ap.add_argument("--format", choices=["jsonl", "parquet"], default="jsonl")
    ap.add_argument("--columns", default=None, help="comma-separated column subset")
    ap.add_argument("--shard-by", default=None, help="range-shard + sort key (e.g. pack_id, url)")
    ap.add_argument("--shards", type=int, default=64)
    ap.add_argument("--max-records-per-file", type=int, default=None)
    ap.add_argument("--compress", default=None, help="e.g. gzip (jsonl), zstd/snappy (parquet)")
    ap.add_argument(
        "--token-counts",
        choices=["bpe", "whitespace", "none"],
        default="bpe",
        help="attach an n_tokens column when absent: frozen-BPE counts "
        "(default), whitespace estimate, or none",
    )
    ap.add_argument("--text-col", default="text", help="text column for --token-counts")
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from invoice_extraction_spark.session import get_spark
    from invoice_extraction_spark.sources.atomic import read_table

    owned = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="export-job", master=args.master)
    from invoice_extraction_spark.plans.parallelism import ensure_min_parallelism

    df = ensure_min_parallelism(read_table(spark, args.table))
    if args.columns:
        df = df.select(*[c.strip() for c in args.columns.split(",")])
    if args.token_counts != "none" and "n_tokens" not in df.columns:
        # default token economics: loaders get real per-doc counts for
        # budget math without re-tokenizing the export
        tcol = args.text_col if args.text_col in df.columns else (
            "extracted_text" if "extracted_text" in df.columns else None
        )
        if tcol is not None:
            from pyspark.sql import functions as F

            if args.token_counts == "bpe":
                from invoice_extraction_spark.functions.bpe import (
                    frozen_bpe_token_count,
                )

                df = df.withColumn("n_tokens", frozen_bpe_token_count()(F.col(tcol)))
            else:
                from invoice_extraction_spark.functions.text_metrics import (
                    token_count,
                )

                df = df.withColumn("n_tokens", token_count(F.col(tcol)))
    if args.shard_by:
        df = df.repartitionByRange(args.shards, args.shard_by).sortWithinPartitions(
            args.shard_by
        )
    writer = df.write.mode("overwrite")
    if args.max_records_per_file:
        writer = writer.option("maxRecordsPerFile", args.max_records_per_file)
    if args.compress:
        writer = writer.option("compression", args.compress)
    if args.format == "jsonl":
        writer.json(args.out)
    else:
        writer.parquet(args.out)
    n_files = sum(
        1
        for f in os.listdir(args.out)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    print(f"exported {df.count()} rows -> {n_files} files at {args.out}")
    if owned:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
