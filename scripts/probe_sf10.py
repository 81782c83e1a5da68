"""sf10 probe of the O(corpus)-state artifacts (VERDICT r4 Next #6):
span-gram index size + build wall, Bloom tier size, per-doc cut-interval
fan-in (the collect_list the rewrite folds), full span-dedup rewrite
wall, and CMS sketch size (constant by design — confirmed, not assumed).
Prints one JSON line; run against /tmp/sf10 (scripts/make_sf1.py 100).

    python scripts/probe_sf10.py [sf_dir]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from invoice_extraction_spark.session import get_spark  # noqa: E402
from invoice_extraction_spark.operators.span_dedup import (  # noqa: E402
    build_gram_bloom,
    duplicate_span_intervals,
    remove_duplicate_spans,
    span_gram_index,
)
from invoice_extraction_spark.operators.cms import cms_sketch  # noqa: E402


def _tree_bytes(p):
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(p)
        for f in fs
        if f.endswith(".parquet")
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
    out = {"sf_dir": sf_dir, "load_at_start": round(os.getloadavg()[0], 2)}
    spark = get_spark("probe-sf10")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["n_docs"] = docs.count()

    # 1. span-gram index: the largest persisted artifact
    t0 = time.monotonic()
    index = span_gram_index(docs, l=20)
    p = "/tmp/sf10_span_index"
    index.write.mode("overwrite").parquet(p)
    out["span_index_build_write_s"] = round(time.monotonic() - t0, 2)
    persisted = spark.read.parquet(p)
    out["span_index_rows"] = persisted.count()
    out["span_index_bytes"] = _tree_bytes(p)

    # 2. Bloom presence tier over it
    t0 = time.monotonic()
    bloom = build_gram_bloom(persisted, n_items=out["span_index_rows"])
    out["bloom_build_s"] = round(time.monotonic() - t0, 2)
    out["bloom_bytes"] = bloom.nbytes
    out["index_over_bloom"] = round(out["span_index_bytes"] / bloom.nbytes, 1)

    # 3. per-doc cut-interval fan-in (the rewrite's collect_list bound)
    iv = duplicate_span_intervals(docs, l=20)
    per_doc = iv.groupBy("id").agg(F.count("*").alias("n"))
    row = per_doc.agg(
        F.count("*").alias("docs_touched"),
        F.max("n").alias("max_iv_per_doc"),
        F.expr("percentile(n, 0.99)").alias("p99_iv_per_doc"),
        F.sum("n").alias("total_intervals"),
    ).collect()[0]
    out.update(
        docs_touched=row["docs_touched"],
        max_iv_per_doc=row["max_iv_per_doc"],
        p99_iv_per_doc=float(row["p99_iv_per_doc"]),
        total_intervals=row["total_intervals"],
    )

    # 4. full rewrite wall
    t0 = time.monotonic()
    n_cut = (
        remove_duplicate_spans(docs, l=20)
        .where("n_tokens_removed > 0")
        .count()
    )
    out["span_rewrite_wall_s"] = round(time.monotonic() - t0, 2)
    out["docs_rewritten"] = n_cut

    # 5. CMS stays O(d*w) regardless of corpus size
    sk = cms_sketch(docs.select(F.col("source").alias("v")), "v")
    out["cms_cells"] = sk.count()

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
