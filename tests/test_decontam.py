"""Benchmark decontamination + mixture sampling: DuckDB oracle parity,
planted-contamination recall, broadcast-plan hygiene, mixture determinism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.decontam import (
    benchmark_contamination,
    benchmark_ngram_index,
    decontaminate,
)
from invoice_extraction_spark.operators.sampling import mixture_sample
from parity import assert_parity, duck

N = 8
_G8 = "concat_ws(' ', t[i], t[i+1], t[i+2], t[i+3], t[i+4], t[i+5], t[i+6], t[i+7])"

CONTAM_SQL = f"""
WITH bt AS (SELECT string_split(text, ' ') AS t FROM bench),
bg AS (SELECT DISTINCT md5(g) AS gh FROM bt,
       unnest(list_transform(range(1, greatest(len(t)-{N - 1}, 1) + 1),
              i -> {_G8})) AS u(g)),
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (SELECT doc_id, md5(g) AS gh FROM toks,
          unnest(list_transform(range(1, greatest(len(t)-{N - 1}, 1) + 1),
                 i -> {_G8})) AS u(g))
SELECT doc_id,
       COUNT(*)::BIGINT AS n_slots,
       CAST(SUM(CASE WHEN bg.gh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bench_slots,
       ROUND(SUM(CASE WHEN bg.gh IS NOT NULL THEN 1 ELSE 0 END) / COUNT(*)::DOUBLE, 4) AS bench_overlap
FROM grams LEFT JOIN bg ON grams.gh = bg.gh
GROUP BY doc_id
"""

MIXTURE_SQL = """
WITH b AS (SELECT source, doc_id,
           CAST(('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10000 AS BIGINT) AS bk
           FROM documents)
SELECT source, doc_id FROM b
WHERE (source = 'src0' AND bk < 3000)
   OR (source = 'src1' AND bk < 500)
   OR source NOT IN ('src0', 'src1')
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def bench_pdf(docs):
    # benchmark suite: 3 verbatim corpus docs (planted contamination) +
    # 2 novel items that share no 8-gram with anything
    copied = (
        docs.filter("doc_id IN (3, 17, 41) AND length(text) > 0")
        .select("text")
        .toPandas()
    )
    novel = pd.DataFrame(
        {
            "text": [
                "zebra quasar violin eats umbrella nine times daily forever",
                "quantum pickle orbits the seventh moon of a copper teapot now",
            ]
        }
    )
    return pd.concat([copied, novel], ignore_index=True)


@pytest.fixture(scope="module")
def con(bench_pdf):
    c = duck()
    c.register("bench", bench_pdf)
    yield c
    c.close()


def test_contamination_matches_oracle(spark, docs, bench_pdf, con):
    bench = spark.createDataFrame(bench_pdf)
    scored = benchmark_contamination(
        docs, benchmark_ngram_index(bench, n=N), id_col="doc_id", n=N
    )
    assert_parity(scored, con, CONTAM_SQL)


def test_planted_docs_fully_flagged(spark, docs, bench_pdf):
    bench = spark.createDataFrame(bench_pdf)
    scored = benchmark_contamination(
        docs, benchmark_ngram_index(bench, n=N), id_col="doc_id", n=N
    )
    flagged = {
        r["doc_id"]: r["bench_overlap"]
        for r in scored.filter("doc_id IN (3, 17, 41)").collect()
    }
    assert all(v == 1.0 for v in flagged.values()), flagged


def test_decontaminate_removes_planted_keeps_most(spark, docs, bench_pdf):
    bench = spark.createDataFrame(bench_pdf)
    clean = decontaminate(docs, bench, id_col="doc_id", n=N)
    kept = {r["doc_id"] for r in clean.select("doc_id").collect()}
    assert not ({3, 17, 41} & kept)
    # only verbatim-overlapping docs are dropped, not the whole corpus
    assert len(kept) > docs.count() * 0.8


def test_bench_index_is_broadcast(spark, docs, bench_pdf):
    bench = spark.createDataFrame(bench_pdf)
    scored = benchmark_contamination(
        docs, benchmark_ngram_index(bench, n=N), id_col="doc_id", n=N
    )
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # the corpus must never shuffle on grams


# --- mixture sampling ------------------------------------------------------


def test_mixture_matches_oracle(spark, docs, con):
    got = mixture_sample(
        docs, "source", {"src0": 0.3, "src1": 0.05}, key_col="doc_id", seed=7
    ).select("source", "doc_id")
    assert_parity(got, con, MIXTURE_SQL)


def test_mixture_unlisted_strata_untouched(spark, docs):
    before = docs.filter("source NOT IN ('src0','src1')").count()
    got = mixture_sample(docs, "source", {"src0": 0.3, "src1": 0.05}, seed=7)
    assert got.filter("source NOT IN ('src0','src1')").count() == before


def test_mixture_partitioning_independent(spark, docs):
    fr = {"src0": 0.5, "src2": 0.2}
    a = {r["doc_id"] for r in mixture_sample(docs, "source", fr).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in mixture_sample(docs.repartition(23, "lang"), "source", fr)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_mixture_rate_roughly_honored(spark, docs):
    n0 = docs.filter("source = 'src0'").count()
    kept = (
        mixture_sample(docs, "source", {"src0": 0.5}, seed=11)
        .filter("source = 'src0'")
        .count()
    )
    assert 0.2 < kept / n0 < 0.8  # small-n binomial, loose bounds
