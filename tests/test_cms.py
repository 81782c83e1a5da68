"""Count-min sketch: merge==whole exactness, the εN error bound against
exact counts on a Zipfian token corpus, and heavy-hitter agreement with the
exact top-k (the test_sketches analog for frequency sketches)."""

import math

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.cms import (
    cms_estimate,
    cms_heavy_hitters,
    cms_merge,
    cms_sketch,
    local_top_candidates,
)

DEPTH, WIDTH = 4, 2048


@pytest.fixture(scope="module")
def tokens(spark):
    """Zipfian tokens: value t{r} appears ~N/r times (r = 1..400) — the
    shape real term distributions take."""
    return (
        spark.range(400)
        .select((F.col("id") + 1).alias("r"))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), (F.lit(4000) / F.col("r")).cast("int")),
                    lambda _: F.concat(F.lit("t"), F.col("r")),
                )
            ).alias("value")
        )
        .persist()
    )


def test_estimates_bounded(spark, tokens):
    exact = {
        r["value"]: r["n"]
        for r in tokens.groupBy("value").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(exact.values())
    sk = cms_sketch(tokens, depth=DEPTH, width=WIDTH)
    est = {
        r["value"]: r["est"]
        for r in cms_estimate(sk, tokens, depth=DEPTH, width=WIDTH).collect()
    }
    assert set(est) == set(exact)
    eps_n = math.e / WIDTH * n_total
    for v, true in exact.items():
        assert est[v] >= true  # CMS never undercounts
        assert est[v] <= true + 2 * eps_n  # εN bound with deterministic margin


def test_merge_of_batches_equals_sketch_of_whole(spark, tokens):
    a = tokens.filter(F.crc32(F.col("value")) % 2 == 0)
    b = tokens.filter(F.crc32(F.col("value")) % 2 == 1)
    merged = cms_merge(
        cms_sketch(a, depth=DEPTH, width=WIDTH).unionByName(
            cms_sketch(b, depth=DEPTH, width=WIDTH)
        )
    )
    whole = cms_sketch(tokens, depth=DEPTH, width=WIDTH)
    as_set = lambda df: {(r["depth"], r["bucket"], r["n"]) for r in df.collect()}
    assert as_set(merged) == as_set(whole)  # counts add -> EXACT mergeability


def test_heavy_hitters_match_exact_topk(spark, tokens):
    """Per-batch local candidates + merged sketch recover the exact global
    top-k on a Zipfian corpus."""
    a = tokens.filter(F.crc32(F.col("value")) % 2 == 0)
    b = tokens.filter(F.crc32(F.col("value")) % 2 == 1)
    sk = cms_merge(
        cms_sketch(a, depth=DEPTH, width=WIDTH).unionByName(
            cms_sketch(b, depth=DEPTH, width=WIDTH)
        )
    )
    cands = local_top_candidates(a, n=64).unionByName(
        local_top_candidates(b, n=64)
    ).select("value")
    got = [
        r["value"]
        for r in cms_heavy_hitters(sk, cands, k=10, depth=DEPTH, width=WIDTH).collect()
    ]
    want = [
        r["value"]
        for r in tokens.groupBy("value")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("value"))
        .limit(10)
        .collect()
    ]
    assert got == want


def test_sketch_is_bounded_and_plan_clean(spark, tokens):
    sk = cms_sketch(tokens, depth=DEPTH, width=WIDTH)
    assert sk.count() <= DEPTH * WIDTH
    plan = sk._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan  # one groupBy shuffle ...
    assert plan.count("Exchange") == 1  # ... and only one
