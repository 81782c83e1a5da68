"""Production job entry point — the spark-submit deployment surface.

    spark-submit --py-files <pkg.zip> jobs/extract.py \
        --source /path/to/pages_parquet --table /path/to/out_table \
        [--partitions 2048] [--resume]

On a cluster, ``--py-files`` ships the package; when run plainly with python,
``get_spark`` self-ships it via addPyFile. The job is idempotent: with
``--resume`` it anti-joins committed urls and only extracts the remainder;
every run lands as one atomic snapshot with per-partition lineage.
"""

from __future__ import annotations

import argparse
import os
import sys
import uuid

# runnable as a plain script: put the repo root (package parent) on sys.path,
# same thing spark-submit's --py-files does for the executors
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="input pages parquet/table dir or WARC glob")
    ap.add_argument(
        "--source-format",
        choices=["parquet", "warc"],
        default="parquet",
        help="parquet table (default) or Common-Crawl-style WARC segments (.warc / .warc.gz)",
    )
    ap.add_argument("--table", required=True, help="output table dir (atomic snapshots)")
    ap.add_argument("--partitions", type=int, default=None, help="salted repartition width")
    ap.add_argument("--salt-seed", type=int, default=42)
    ap.add_argument("--resume", action="store_true", help="skip already-committed urls")
    ap.add_argument(
        "--dedup",
        action="store_true",
        help="drop exact-duplicate pages (same html fingerprint) before extraction",
    )
    ap.add_argument(
        "--url-dedup",
        action="store_true",
        help="drop url-variant duplicates (tracking params, fragments, case, "
        "default ports) by canonical url BEFORE extraction — the cheapest "
        "dedup tier; runs ahead of --dedup's payload hashing",
    )
    ap.add_argument(
        "--respect-noindex",
        action="store_true",
        help="drop pages carrying a meta robots/googlebot noindex directive "
        "(map-only gate, runs before anything expensive)",
    )
    ap.add_argument(
        "--domain-quota",
        type=int,
        default=None,
        help="cap input documents per registered domain (deterministic "
        "md5-rank selection) — the anti-over-representation gate, applied "
        "before extraction so capped docs never cost Arrow time",
    )
    ap.add_argument(
        "--compact", action="store_true", help="compact the table after committing"
    )
    ap.add_argument(
        "--stats-cols",
        default=None,
        help="comma-separated columns to record per-file min/max stats for "
        "in the manifest (footer metadata only) — enables manifest-level "
        "file skipping via read_table(prune=...)",
    )
    ap.add_argument(
        "--partition-by",
        default=None,
        help="comma-separated output partition columns (e.g. lang) — readers "
        "filtering on them prune whole directories at scan planning",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from invoice_extraction_spark.operators.extract import extract_pages
    from invoice_extraction_spark.session import get_spark
    from invoice_extraction_spark.sources.atomic import commit_append, pending_source

    # only stop a session this job created — getOrCreate may hand us the
    # caller's (e.g. a test harness driving main() in-process)
    owned = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="extract-job", master=args.master)
    if args.source_format == "warc":
        from invoice_extraction_spark.sources.warc import read_warc

        src = read_warc(spark, args.source).drop("segment")
    else:
        src = spark.read.parquet(args.source)
    if args.resume:
        src = pending_source(src, args.table)
    if args.respect_noindex:
        from invoice_extraction_spark.functions.robots import drop_noindex

        src = drop_noindex(src, html_col="html")
    if args.url_dedup:
        # canonical-url dedup first: shuffles only short canonical strings,
        # so it is cheaper than payload hashing and much cheaper than the
        # Arrow extraction stage it spares duplicates from
        from invoice_extraction_spark.functions.urls import dedup_by_canonical_url

        src = dedup_by_canonical_url(src, url_col="url")
    if args.dedup:
        # exact dedup on the raw payload before any extraction work:
        # hash-groupBy on md5(html), keep min url — duplicates never reach
        # the (expensive) Arrow stage
        from invoice_extraction_spark.operators.dedup import dedup_exact

        src = dedup_exact(src, text_col="html", id_col="url")
    if args.domain_quota:
        from invoice_extraction_spark.functions.urls import domain_quota_filter

        src = domain_quota_filter(src, max_per_domain=args.domain_quota)
    out = extract_pages(src, num_partitions=args.partitions, salt_seed=args.salt_seed)
    manifest = commit_append(
        out,
        args.table,
        run_id=uuid.uuid4().hex[:12],
        partition_by=args.partition_by.split(",") if args.partition_by else None,
        stats_cols=args.stats_cols.split(",") if args.stats_cols else None,
    )
    n = sum(ln["n_rows"] for ln in manifest["lineage"])
    ok = sum(ln["n_ok"] for ln in manifest["lineage"])
    print(f"committed run_id={manifest['run_id']} rows={n} ok={ok}")
    if args.compact:
        from invoice_extraction_spark.sources.atomic import compact

        m = compact(spark, args.table)
        print(f"compacted -> run_id={m['run_id']} files={len(m['files'])}")
    if owned:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
