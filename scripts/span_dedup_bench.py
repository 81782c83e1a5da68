"""Span-dedup wall at sf1, fast (Rabin-Karp Arrow kernel) vs md5 Column
form, interleaved best-of-N so neighbor load hits both paths equally.

Usage: python scripts/span_dedup_bench.py [sf_dir] [reps]
Prints one JSON line with per-rep walls and the interval-count check
(the two paths must report identical interval counts on the same data).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from invoice_extraction_spark.session import get_spark  # noqa: E402
from invoice_extraction_spark.operators.span_dedup import (  # noqa: E402
    duplicate_span_intervals,
    remove_duplicate_spans,
)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("span-dedup-bench")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.count()  # warm scan + python workers
    walls = {"fast": [], "column": []}
    n_iv = {}
    for _ in range(reps):
        for mode, fast in (("fast", True), ("column", False)):
            t0 = time.monotonic()
            out = remove_duplicate_spans(docs, l=20, fast=fast)
            n_docs = out.where("n_tokens_removed > 0").count()
            walls[mode].append(round(time.monotonic() - t0, 2))
            n_iv[mode] = n_docs
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "walls": walls,
                "best": {k: min(v) for k, v in walls.items()},
                "docs_touched": n_iv,
                "interval_counts_match": len(set(n_iv.values())) == 1,
                "load_at_start": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
