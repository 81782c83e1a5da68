"""Sequence packing: DuckDB oracle parity, partitioning-independence,
overflow semantics, utilisation summary."""

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.text_metrics import token_count
from invoice_extraction_spark.operators.packing import (
    pack_documents,
    pack_stats,
    packing_summary,
)
from parity import assert_parity, duck

BUDGET = 256

PACK_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN length(text) = 0 THEN 0
              ELSE length(string_split(text, ' ')) END AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM d
)
SELECT doc_id,
       source || '#' || CAST(FLOOR(cum_before / {BUDGET}) AS BIGINT) AS pack_id,
       CAST(FLOOR(cum_before / {BUDGET}) AS BIGINT) AS pack_seq,
       CAST(cum_before % {BUDGET} AS BIGINT) AS pack_offset
FROM packed
"""

STATS_SQL = f"""
WITH d AS (
  SELECT doc_id, source,
         CASE WHEN length(text) = 0 THEN 0
              ELSE length(string_split(text, ' ')) END AS n_tokens
  FROM documents
),
packed AS (
  SELECT source, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM d
)
SELECT source || '#' || CAST(FLOOR(cum_before / {BUDGET}) AS BIGINT) AS pack_id,
       count(*)::BIGINT AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
       ROUND(SUM(n_tokens) / {BUDGET}.0, 4) AS fill_ratio
FROM packed GROUP BY 1
"""


@pytest.fixture(scope="module")
def docs_tok(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return df.withColumn("n_tokens", token_count("text"))


@pytest.fixture(scope="module")
def con():
    c = duck()
    yield c
    c.close()


def test_pack_assignment_matches_oracle(spark, docs_tok, con):
    packed = pack_documents(
        docs_tok, "n_tokens", BUDGET, shard_col="source", order_col="doc_id"
    ).select("doc_id", "pack_id", "pack_seq", "pack_offset")
    assert_parity(packed, con, PACK_SQL)


def test_pack_stats_match_oracle(spark, docs_tok, con):
    packed = pack_documents(
        docs_tok, "n_tokens", BUDGET, shard_col="source", order_col="doc_id"
    )
    assert_parity(pack_stats(packed, BUDGET), con, STATS_SQL)


def test_partitioning_independent(spark, docs_tok):
    """Pack assignment is a pure function of (shard, order, tokens) — the
    same corpus under a different physical partitioning packs identically."""
    a = pack_documents(docs_tok, "n_tokens", BUDGET, "source", "doc_id")
    b = pack_documents(
        docs_tok.repartition(17, "lang"), "n_tokens", BUDGET, "source", "doc_id"
    )
    pa = a.select("doc_id", "pack_id").toPandas().sort_values("doc_id").reset_index(drop=True)
    pb = b.select("doc_id", "pack_id").toPandas().sort_values("doc_id").reset_index(drop=True)
    assert pa.equals(pb)


def test_overflow_semantics(spark):
    """A doc straddling the boundary overflows its open pack; the NEXT doc
    starts the new pack."""
    rows = [("s", 1, 200), ("s", 2, 100), ("s", 3, 10)]
    df = spark.createDataFrame(rows, "shard string, doc_id long, n_tokens long")
    packed = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"])
        for r in pack_documents(df, "n_tokens", 256, "shard", "doc_id").collect()
    }
    assert packed[1] == ("s#0", 0)
    assert packed[2] == ("s#0", 200)  # 200 < 256: joins pack 0, overflows it
    assert packed[3] == ("s#1", 44)  # cum_before=300 -> pack 1, offset 300-256
    # zero-token docs never open a phantom pack
    rows2 = [("s", 1, 0), ("s", 2, 0), ("s", 3, 5)]
    df2 = spark.createDataFrame(rows2, "shard string, doc_id long, n_tokens long")
    assert (
        pack_documents(df2, "n_tokens", 256, "shard", "doc_id")
        .select(F.countDistinct("pack_id"))
        .collect()[0][0]
        == 1
    )


def test_summary_shape(spark, docs_tok):
    packed = pack_documents(docs_tok, "n_tokens", BUDGET, "source", "doc_id")
    s = packing_summary(packed, BUDGET).collect()[0]
    assert s["n_packs"] > 0
    assert 0.0 < s["token_utilisation"] < 2.0
    assert 0.0 <= s["overflow_pack_frac"] <= 1.0
    # utilisation is tokens / (packs * budget) — recompute independently
    tot = docs_tok.agg(F.sum("n_tokens")).collect()[0][0]
    assert abs(s["token_utilisation"] - tot / (s["n_packs"] * BUDGET)) < 1e-3
