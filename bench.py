"""Per-round benchmark. Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "pages_per_sec": ...}

Headline: full extraction pipeline (synth corpus -> extract_pages -> count)
sized to the sf tier (sf * 500k pages). Plus wall times for representative
operator-family queries at $SPARK_GRAFT_SF_DIR.

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from invoice_extraction_spark.corpus import synth_pages_spark
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.session import get_spark

import __spark_entry__ as entrymod

BENCH_QUERIES = [
    "pricing_summary",
    "revenue_top_customers",
    "minhash_signatures",
    "lsh_pairs",
    "simhash_bands",
    "cosine_topk",
    "centroid_topk_per_label",
    "user_sessions",
    "doc_stats_by_lang",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1
    n_pages = int(sf * 500_000)

    spark = get_spark(app_name="bench", master=f"local[{cpus}]", shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")

    # warmup: JVM + python workers
    spark.range(1000).selectExpr("sum(id)").collect()

    # headline: synth + extract, end to end
    t0 = time.time()
    pages = synth_pages_spark(spark, n_pages, partitions=cpus * 2)
    out = extract_pages(pages, num_partitions=cpus * 2)
    n_out = out.count()
    extract_wall = time.time() - t0
    assert n_out == n_pages, (n_out, n_pages)

    queries = {"extract_pages_e2e": round(extract_wall, 3)}
    qs = entrymod.queries()
    for name in BENCH_QUERIES:
        t0 = time.time()
        df = qs[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    result = {
        "metric": "extract_pages_e2e_wall",
        "value": round(extract_wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "n_pages": n_pages,
        "pages_per_sec": round(n_pages / extract_wall, 1),
        "cpus": cpus,
    }
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
