"""applyInPandasWithState: per-host counters survive across separate
checkpointed AvailableNow runs (state store continuity)."""

from pyspark.sql import functions as F

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.streaming.stateful import run_host_stats


def test_host_stats_accumulate_across_runs(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    stats = str(tmp_path / "stats")
    pp = pages_pdf(40)

    spark.createDataFrame(pp.iloc[:25]).coalesce(1).write.mode("append").parquet(src)
    run_host_stats(spark, src, ckpt, stats)

    spark.createDataFrame(pp.iloc[25:]).coalesce(1).write.mode("append").parquet(src)
    got_df = run_host_stats(spark, src, ckpt, stats)
    got = {r["host"]: (r["n_pages"], r["n_bytes"]) for r in got_df.collect()}

    # totals for hosts touched in run 2 must equal FULL-corpus counts
    # (state carried over from run 1), not just run-2 increments
    full = spark.createDataFrame(pp).withColumn(
        "host", F.regexp_extract("url", r"https://([^/]+)/", 1)
    )
    want = {
        r["host"]: (r["n"], r["b"])
        for r in full.groupBy("host")
        .agg(F.count("*").alias("n"), F.sum(F.length("html")).alias("b"))
        .collect()
    }
    assert got  # at least one host updated in run 2
    for host, (n, b) in got.items():
        assert (n, b) == want[host], host
