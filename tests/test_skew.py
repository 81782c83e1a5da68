"""Host-skew handling proof (north rule: "explicit hash-partitioning on url +
salted repartition for host skew"; SURVEY.md §7 hard part #2).

The corpus draws hosts Zipfian (s=1.2, FIXTURES.md §1), so partitioning by
host — what naive WARC locality gives you — pins the hottest host's pages to
one partition. The salted url-hash repartition must spread them flat.
"""

from pyspark.sql import functions as F

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import salted_repartition

N_DOCS = 2000
K = 16


def _partition_sizes(df):
    return [
        r["n"]
        for r in df.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count("*").alias("n"))
        .collect()
    ]


def test_corpus_hosts_are_zipfian(spark):
    df = spark.createDataFrame(pages_pdf(N_DOCS))
    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    counts = sorted(
        (r["n"] for r in df.groupBy(host.alias("h")).agg(F.count("*").alias("n")).collect()),
        reverse=True,
    )
    # top host should dominate (Zipf s=1.2 over 40 hosts -> ~17% of docs)
    assert counts[0] > N_DOCS * 0.10
    assert counts[0] > 4 * counts[9]


def test_salted_repartition_beats_host_partitioning(spark):
    df = spark.createDataFrame(pages_pdf(N_DOCS))
    mean = N_DOCS / K

    host = F.regexp_extract("url", r"https://([^/]+)/", 1)
    by_host = df.repartition(K, host)
    host_sizes = _partition_sizes(by_host)

    salted = salted_repartition(df, K)
    salted_sizes = _partition_sizes(salted)

    # host-keyed: the hot host pins a partition well above the mean
    assert max(host_sizes) > 1.8 * mean, host_sizes
    # salted url-hash: flat within ~25% of the mean
    assert max(salted_sizes) < 1.25 * mean, salted_sizes
    # and strictly better than the skewed layout
    assert max(salted_sizes) < max(host_sizes)
