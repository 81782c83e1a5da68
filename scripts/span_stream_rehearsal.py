"""Streaming span-dedup rehearsal at sf1: feed the 50k-document corpus as
K sequential drops through ``run_span_dedup_stream`` and measure per-drop
wall, index growth, and cut counts — the evidence for the incremental
contract's scale shape (each drop costs O(drop + index probe); historical
TEXT is never re-read, only the hash index).

Usage: python scripts/span_stream_rehearsal.py [sf_dir] [n_drops]
Prints one JSON line; paste numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from invoice_extraction_spark.session import get_spark  # noqa: E402
from invoice_extraction_spark.sources.atomic import read_table  # noqa: E402
from invoice_extraction_spark.streaming.span_dedup_stream import (  # noqa: E402
    run_span_dedup_stream,
)


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dd, fs in os.walk(d)
        for f in fs
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_drops = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    base = "/tmp/span_stream_rehearsal"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/source"
    table = f"{base}/table"
    index = f"{base}/index"
    ckpt = f"{base}/ckpt"
    os.makedirs(src)

    spark = get_spark(app_name="span-stream-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id"), F.col("text"))
        .withColumn("_drop", F.abs(F.hash("doc_id")) % n_drops)
        .persist()
    )
    n_docs = docs.count()

    drops = []
    for i in range(n_drops):
        # one new file lands, then the stream drains it — a daily-drop feed
        docs.filter(F.col("_drop") == i).drop("_drop").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        t0 = time.monotonic()
        run_span_dedup_stream(
            spark,
            src,
            table,
            index,
            ckpt,
            schema="doc_id long, text string",
            id_col="doc_id",
            max_files_per_trigger=1,
        )
        wall = round(time.monotonic() - t0, 2)
        drops.append(
            {
                "drop": i,
                "wall_s": wall,
                "index_bytes": _dir_bytes(index),
                "index_partitions": len(
                    [d for d in os.listdir(index) if d.startswith("seq=")]
                ),
            }
        )

    out_rows = read_table(spark, table)
    n_out = out_rows.count()
    n_cut = out_rows.filter("n_tokens_removed > 0").count()
    idx = spark.read.option("basePath", index).parquet(index)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_drops": n_drops,
                "drops": drops,
                "docs_out": n_out,
                "docs_with_cuts": n_cut,
                "index_grams_total": idx.count(),
                "load_at_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
