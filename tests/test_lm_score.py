"""Unigram LM quality scoring: DuckDB oracle parity, sampled-fit sanity,
broadcast-plan hygiene."""

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.lm_score import (
    fit_unigram_lm,
    lm_quality,
    lm_quality_buckets,
)

from parity import assert_parity, duck

VOCAB = 200

FIT_SQL = f"""
WITH tok AS (
  SELECT unnest(string_split(lower(text), ' ')) AS token FROM documents
),
counts AS (
  SELECT token, count(*)::BIGINT AS n FROM tok WHERE token <> '' GROUP BY token
),
tot AS (SELECT SUM(n)::DOUBLE AS t FROM counts),
vocab AS (
  SELECT token, ln(n / t) AS logp FROM counts, tot
  ORDER BY n DESC, token LIMIT {VOCAB}
)
SELECT token, logp FROM vocab
UNION ALL
SELECT '__oov__' AS token, ln(0.5 / t) AS logp FROM tot
"""

SCORE_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token FROM documents
),
tok2 AS (SELECT doc_id, token FROM tok WHERE token <> ''),
counts AS (
  SELECT token, count(*)::BIGINT AS n FROM tok2 GROUP BY token
),
tot AS (SELECT SUM(n)::DOUBLE AS t FROM counts),
vocab AS (
  SELECT token, ln(n / t) AS logp FROM counts, tot
  ORDER BY n DESC, token LIMIT {VOCAB}
),
scored AS (
  SELECT doc_id, coalesce(v.logp, (SELECT ln(0.5 / t) FROM tot)) AS logp
  FROM tok2 LEFT JOIN vocab v USING (token)
)
SELECT doc_id, count(*)::BIGINT AS n_tokens,
       ROUND(AVG(logp), 4) AS mean_logp,
       ROUND(EXP(-AVG(logp)), 4) AS pseudo_perplexity
FROM scored GROUP BY doc_id
"""


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


@pytest.fixture(scope="module")
def con():
    c = duck()
    yield c
    c.close()


def test_fit_matches_oracle(spark, docs, con):
    lm = fit_unigram_lm(docs, vocab_size=VOCAB)
    assert_parity(lm, con, FIT_SQL)


def test_score_matches_oracle(spark, docs, con):
    lm = fit_unigram_lm(docs, vocab_size=VOCAB)
    scored = lm_quality(docs, lm, id_col="doc_id")
    assert_parity(scored, con, SCORE_SQL)


def test_fluent_text_beats_gibberish(spark, docs):
    """The model must actually rank: common-token prose scores lower
    pseudo-perplexity than out-of-vocab gibberish."""
    lm = fit_unigram_lm(docs, vocab_size=VOCAB)
    common = (
        fit_unigram_lm(docs, vocab_size=5)
        .filter("token <> '__oov__'")
        .toPandas()["token"]
        .tolist()
    )
    probe = spark.createDataFrame(
        [(1, " ".join(common * 4)), (2, "zxqv wqzzk vvxqj plorp zzfff qqqqv")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["pseudo_perplexity"] for r in lm_quality(probe, lm, id_col="doc_id").collect()}
    assert got[1] < got[2]


def test_sampled_fit_close_to_full_fit(spark, docs):
    """The 100-TB path: a 50% hash-sample fit ranks documents almost
    identically to the full fit (unigram counts converge fast)."""
    full = fit_unigram_lm(docs, vocab_size=VOCAB)
    sampled = fit_unigram_lm(docs, vocab_size=VOCAB, fit_fraction=0.5)
    sf = lm_quality(docs, full, id_col="doc_id").toPandas().set_index("doc_id")
    ss = lm_quality(docs, sampled, id_col="doc_id").toPandas().set_index("doc_id")
    joined = sf.join(ss, lsuffix="_f", rsuffix="_s")
    corr = joined["mean_logp_f"].corr(joined["mean_logp_s"])
    assert corr > 0.95, corr


def test_buckets_partition_everything(spark, docs):
    lm = fit_unigram_lm(docs, vocab_size=VOCAB)
    scored = lm_quality(docs, lm, id_col="doc_id")
    buckets = lm_quality_buckets(scored, edges=[50.0, 200.0]).toPandas()
    assert int(buckets["n_docs"].sum()) == scored.count()
    assert set(buckets["ppl_bucket"]) <= {"<50", "50-200", ">=200"}


def test_model_join_is_broadcast_and_no_crossjoin(spark, docs):
    lm = fit_unigram_lm(docs, vocab_size=VOCAB)
    plan = lm_quality(docs, lm, id_col="doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # the corpus side must never shuffle on token: the only Exchange keys
    # allowed are the doc-id re-agg and the tiny model-side aggregates
    assert "CartesianProduct" not in plan
