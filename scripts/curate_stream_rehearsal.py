"""Composed curation-stream rehearsal at sf1: feed the 50k-document
corpus as K sequential drops through ``run_curate_stream`` with the
quality/repetition gates plus all three dedup tiers (exact fingerprints,
LSH bands, span grams) enabled, and measure per-drop wall, per-index
growth, and retention — the evidence that the composed incremental chain
keeps the per-drop cost O(drop + index probes) while three state families
accumulate.

Usage: python scripts/curate_stream_rehearsal.py [sf_dir] [n_drops]
[near_verify] [span_bloom]
(near_verify: 1 = confirm cross-batch band collisions against the
persisted signature index before dropping; span_bloom: 1 = probe the
span-gram index through the Bloom presence tier). Prints one JSON line;
paste numbers into BENCH/BASELINE.md.
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
from invoice_extraction_spark.streaming.curate_stream import (  # noqa: E402
    index_dirs,
    run_curate_stream,
)


def _dir_bytes(d: str) -> int:
    if not os.path.isdir(d):
        return 0
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _dd, fs in os.walk(d)
        for f in fs
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_drops = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    near_verify = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    span_bloom = bool(int(sys.argv[4])) if len(sys.argv) > 4 else False
    base = "/tmp/curate_stream_rehearsal"
    shutil.rmtree(base, ignore_errors=True)
    src = f"{base}/source"
    table = f"{base}/table"
    index = f"{base}/index"
    ckpt = f"{base}/ckpt"
    os.makedirs(src)

    spark = get_spark(app_name="curate-stream-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id"), F.col("text"))
        .withColumn("_drop", F.abs(F.hash("doc_id")) % n_drops)
        .persist()
    )
    n_docs = docs.count()

    d = index_dirs(index)
    drops = []
    for i in range(n_drops):
        docs.filter(F.col("_drop") == i).drop("_drop").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        load0 = round(os.getloadavg()[0], 2)
        t0 = time.monotonic()
        run_curate_stream(
            spark,
            src,
            table,
            index,
            ckpt,
            schema="doc_id long, text string",
            id_col="doc_id",
            min_quality=0.05,
            repetition_gate=True,
            exact=True,
            near=True,
            near_verify=near_verify,
            span_l=20,
            span_bloom=span_bloom,
            max_files_per_trigger=1,
        )
        wall = round(time.monotonic() - t0, 2)
        drops.append(
            {
                "drop": i,
                "wall_s": wall,
                "load_at_start": load0,
                "exact_bytes": _dir_bytes(d["exact"]),
                "bands_bytes": _dir_bytes(d["bands"]),
                "grams_bytes": _dir_bytes(d["grams"]),
            }
        )

    out = read_table(spark, table)
    n_out = out.count()
    n_cut = out.filter("n_tokens_removed > 0").count()
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "n_drops": n_drops,
                "gates": {"min_quality": 0.05, "repetition_gate": True},
                "tiers": {
                    "exact": True,
                    "near": True,
                    "near_verify": near_verify,
                    "span_l": 20,
                    "span_bloom": span_bloom,
                },
                "drops": drops,
                "docs_out": n_out,
                "docs_dropped": n_docs - n_out,
                "docs_with_span_cuts": n_cut,
                "load_at_end": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
