"""sf10 (100x sf0.1 = 500k docs / ~20M lineitem rows) walls for the
heavy relational bench queries — the relational half of the sf10 probe
(``probe_sf10.py`` covers the O(corpus)-state artifacts; the full
50-query oracle gate is already green at this scale). Reuses bench.py's
protocol pieces: load-gated start, table warm pass, best + trimmed
median over reps, noop sink.

    python scripts/sf10_query_bench.py [sf_dir=/tmp/sf10] [reps=3]

Writes BENCH/sf10_queries_r5.json and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from bench import BENCH_QUERIES, _best_of, _trimmed_median, _wait_for_quiet  # noqa: E402
from invoice_extraction_spark.session import get_spark  # noqa: E402


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    quiet, l1, l5 = _wait_for_quiet(
        float(os.environ.get("SPARK_GRAFT_MAX_LOAD", "1.0")),
        float(os.environ.get("SPARK_GRAFT_QUIET_WAIT", "240")),
    )
    spark = get_spark(app_name="sf10-bench", master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    t0 = time.time()
    for t in ("lineitem", "orders", "customer", "nation", "events",
              "documents", "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    warm = round(time.time() - t0, 3)

    walls, meds = {}, {}
    for name in BENCH_QUERIES:
        def run_q(name=name):
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

        _best, walls[name] = _best_of(reps, run_q)
        meds[name] = _trimmed_median(walls[name])

    out = {
        "sf": 10,
        "sf_dir": sf_dir,
        "reps": reps,
        "quiet": quiet,
        "load_at_start": l1,
        "load_at_start_5m": l5,
        "table_warm_wall": warm,
        "queries": meds,
        "query_walls": walls,
        "query_bests": {k: min(v) for k, v in walls.items()},
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/sf10_queries_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
