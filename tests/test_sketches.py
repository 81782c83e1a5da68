"""Mergeable sketch rollups: error bounds vs exact answers, merge-vs-whole
equality, and the incremental no-rescan flow over table snapshots."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.sketches import (
    distinct_sketches,
    merge_distinct_estimate,
    merge_quantile_estimate,
    quantile_sketches,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet("/root/testdata/sf0.01/documents.parquet")


def test_hll_estimate_within_error(spark, docs):
    est = merge_distinct_estimate(distinct_sketches(docs, "doc_id")).collect()[0][
        "n_distinct"
    ]
    true = docs.select(F.countDistinct("doc_id")).collect()[0][0]
    assert abs(est - true) / true < 0.05


def test_hll_merge_matches_whole_within_bound(spark, docs):
    """Sketch(first half) ∪ sketch(second half) ≈ sketch(everything) — the
    property that makes per-batch sketches a sufficient statistic. Not
    bit-equal: a small single-pass sketch answers exactly from sparse mode
    while a union is forced dense; both stay inside the error bound."""
    half_a = distinct_sketches(docs.filter("doc_id % 2 = 0"), "doc_id")
    half_b = distinct_sketches(docs.filter("doc_id % 2 = 1"), "doc_id")
    merged = merge_distinct_estimate(half_a.unionByName(half_b)).collect()[0][
        "n_distinct"
    ]
    whole = merge_distinct_estimate(distinct_sketches(docs, "doc_id")).collect()[0][
        "n_distinct"
    ]
    assert abs(merged - whole) / whole < 0.02


def test_grouped_sketches(spark, docs):
    per_lang = merge_distinct_estimate(
        distinct_sketches(docs, "doc_id", group_cols=["lang"]), group_cols=["lang"]
    )
    got = {r["lang"]: r["n_distinct"] for r in per_lang.collect()}
    true = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.countDistinct("doc_id").alias("n")).collect()
    }
    assert set(got) == set(true)
    for k in true:
        assert abs(got[k] - true[k]) / true[k] < 0.08


def test_kll_quantiles_close_to_exact(spark, docs):
    sk = quantile_sketches(docs, "n_chars")
    got = merge_quantile_estimate(sk, [0.5, 0.99]).collect()[0]
    exact = docs.agg(
        F.expr("percentile(n_chars, 0.5)").alias("p50"),
        F.expr("percentile(n_chars, 0.99)").alias("p99"),
    ).collect()[0]
    # KLL guarantees RANK error; check the value at the estimated quantile
    # has rank within ~2% of the target
    n = docs.count()
    for q, p in ((got["q_0_5"], 0.5), (got["q_0_99"], 0.99)):
        rank = docs.filter(F.col("n_chars") <= q).count() / n
        assert abs(rank - p) < 0.02, (q, p, rank, exact)


def test_incremental_sketch_flow_over_snapshots(spark, tmp_path):
    """Sketch ONLY each commit's delta (read_appended) and union — equals
    sketching the whole table, with history never rescanned."""
    from invoice_extraction_spark.sources.atomic import commit_append, read_appended, read_table

    tbl = str(tmp_path / "tbl")
    pdf = pd.DataFrame({"doc_id": range(300), "extracted_text": ["x"] * 300})
    df = spark.createDataFrame(pdf)
    commit_append(df.filter("doc_id < 100"), tbl, run_id="d1", ok_predicate="doc_id >= 0")
    commit_append(
        df.filter("doc_id >= 100 AND doc_id < 180"), tbl, run_id="d2", ok_predicate="doc_id >= 0"
    )
    commit_append(df.filter("doc_id >= 180"), tbl, run_id="d3", ok_predicate="doc_id >= 0")

    deltas = [
        distinct_sketches(read_table(spark, tbl, as_of="d1"), "doc_id"),
        distinct_sketches(read_appended(spark, tbl, "d1", until="d2"), "doc_id"),
        distinct_sketches(read_appended(spark, tbl, "d2", until="d3"), "doc_id"),
    ]
    stats = deltas[0]
    for d in deltas[1:]:
        stats = stats.unionByName(d)
    inc = merge_distinct_estimate(stats).collect()[0]["n_distinct"]
    assert abs(inc - 300) / 300 < 0.05  # all three deltas, counted once each
