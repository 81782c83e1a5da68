"""Error-analysis report job — the reference's ``run_full_analysis`` CLI
surface (error_analysis.py:340-368) over a committed extraction table.

    spark-submit --py-files <pkg.zip> jobs/report.py \
        --table /path/to/out_table --out /path/to/report_dir \
        [--pseudo-labels /path/to/training_export]

Reads the committed snapshot (never uncommitted files), writes report.json +
error_distribution.svg (tiny driver-side aggregates), and optionally exports
the >= 0.85-consensus pseudo-label slice as parquet for weak supervision
(consensus.py:196-222).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True, help="committed extraction table dir")
    ap.add_argument("--out", required=True, help="report output dir")
    ap.add_argument(
        "--pseudo-labels",
        default=None,
        help="also export the high-confidence slice as parquet here",
    )
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from invoice_extraction_spark.operators.errors import save_error_report
    from invoice_extraction_spark.operators.extract import pseudo_labels
    from invoice_extraction_spark.session import get_spark
    from invoice_extraction_spark.sources.atomic import read_table

    # only stop a session this job created — getOrCreate may hand us the
    # caller's (e.g. a test harness driving main() in-process)
    owned = SparkSession.getActiveSession() is None
    spark = get_spark(app_name="report-job", master=args.master)
    df = read_table(spark, args.table)
    report = save_error_report(df, args.out)
    print(json.dumps({"out": args.out, "severity": report["severity"]}))
    if args.pseudo_labels:
        pseudo_labels(df).write.mode("overwrite").parquet(args.pseudo_labels)
        print(json.dumps({"pseudo_labels": args.pseudo_labels}))
    if owned:
        spark.stop()


if __name__ == "__main__":
    main()
