"""Operators whose driver-registry slots were given to newer ops keep
hash-checked parity here (the registry is capped at 50 driver rows; the
operator coverage itself must not regress): document fingerprints and
top-N frequency."""

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions import text_metrics as tm
from parity import assert_parity, duck

FINGERPRINT_SQL = """
SELECT doc_id, md5(concat_ws('|', CAST(length(text) AS VARCHAR),
       substr(text, 1, 64), substr(reverse(text), 1, 64))) AS fp
FROM documents WHERE doc_id < 100 ORDER BY doc_id
"""

TOP5_SQL = """
SELECT event_type, COUNT(*) AS n FROM events
GROUP BY event_type ORDER BY n DESC, event_type LIMIT 5
"""


@pytest.fixture(scope="module")
def con():
    c = duck()
    yield c
    c.close()


def test_fingerprints_parity(spark, con):
    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        F.col("doc_id") < 100
    )
    got = d.select("doc_id", tm.fingerprint("text").alias("fp")).orderBy("doc_id")
    assert_parity(got, con, FINGERPRINT_SQL)


def test_top5_frequency_parity(spark, con):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "event_type")
        .limit(5)
    )
    assert_parity(got, con, TOP5_SQL)
