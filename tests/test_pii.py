"""PII scrubbing: exact redaction strings, count agreement, ordering (a
phone pattern must never eat an already-typed email/IP's digits)."""

import pandas as pd
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.pii import pii_counts, scrub_pii


def _scrub(spark, texts):
    df = spark.createDataFrame(pd.DataFrame({"i": range(len(texts)), "text": texts}))
    counts = pii_counts(F.col("text"))
    rows = df.select(
        "i",
        scrub_pii("text").alias("s"),
        counts["n_emails"].alias("e"),
        counts["n_ips"].alias("p"),
        counts["n_phones"].alias("t"),
    ).collect()
    return {r["i"]: r for r in rows}


def test_exact_redactions(spark):
    got = _scrub(
        spark,
        [
            "mail jane.doe+x@example.co.in now",
            "host 10.0.0.1 up",
            "call +91 98765 43210 today",
            "clean text 2021",
        ],
    )
    assert got[0]["s"] == "mail <EMAIL> now" and got[0]["e"] == 1
    assert got[1]["s"] == "host <IP> up" and got[1]["p"] == 1
    assert got[2]["s"] == "call <PHONE> today" and got[2]["t"] == 1
    assert got[3]["s"] == "clean text 2021"
    assert got[3]["e"] == got[3]["p"] == got[3]["t"] == 0


def test_phone_never_eats_typed_matches(spark):
    """Emails and IPs are redacted FIRST; their digits must not then be
    re-matched as phone fragments."""
    got = _scrub(spark, ["x 192.168.001.200 y", "a 12345678@q.cc b"])
    assert got[0]["s"] == "x <IP> y" and got[0]["t"] == 0
    assert got[1]["s"] == "a <EMAIL> b" and got[1]["t"] == 0


def test_scrub_is_pure_column(spark):
    from invoice_extraction_spark.plans.explain import has_row_python_udf

    df = spark.createDataFrame(pd.DataFrame({"text": ["a@b.cc"]}))
    assert not has_row_python_udf(df.select(scrub_pii("text")))
