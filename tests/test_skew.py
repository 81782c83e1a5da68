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


# --- salted JOIN (operators/skew.py) ---------------------------------------


def _skewed_frames(spark):
    import pandas as pd

    # 90% of big-side rows share one key — the pathological hot key
    big = pd.DataFrame(
        {
            "k": ["hot"] * 900 + [f"k{i}" for i in range(100)],
            "v": range(1000),
        }
    )
    other = pd.DataFrame(
        {"k": ["hot"] + [f"k{i}" for i in range(0, 200, 2)], "w": range(101)}
    )
    return spark.createDataFrame(big), spark.createDataFrame(other)


def test_salted_join_equals_plain_join(spark):
    from invoice_extraction_spark.operators.skew import salted_join

    big, other = _skewed_frames(spark)
    for how in ("inner", "left"):
        plain = {
            tuple(r) for r in big.join(other, "k", how).select("k", "v", "w").collect()
        }
        salted = {
            tuple(r)
            for r in salted_join(big, other, "k", n_salts=8, how=how)
            .select("k", "v", "w")
            .collect()
        }
        assert salted == plain, how


def test_salting_spreads_the_hot_key(spark):
    """The hot key's rows land on many (key, salt) shuffle keys instead of
    one — measured as the max single-shuffle-key share dropping ~8x."""
    from invoice_extraction_spark.operators.skew import salted_join

    big, other = _skewed_frames(spark)
    plain_max = (
        big.groupBy("k").count().agg(F.max("count")).collect()[0][0]
    )
    salted = big.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns], F.lit(42)), F.lit(8)).cast("int"),
    )
    salted_max = (
        salted.groupBy("k", "_salt").count().agg(F.max("count")).collect()[0][0]
    )
    assert plain_max == 900
    assert salted_max < 900 / 4  # spread across 8 salts (binomial slack)


def test_key_skew_report(spark):
    from invoice_extraction_spark.operators.skew import key_skew_report

    big, _ = _skewed_frames(spark)
    top = key_skew_report(big, "k", top_n=3).collect()
    assert top[0]["k"] == "hot" and top[0]["row_share"] == 0.9
