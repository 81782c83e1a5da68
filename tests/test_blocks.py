"""Block feature export + tag-path NB classifier: kernel fidelity, PDF
coverage, DuckDB bucket parity, deterministic fit, rule-distillation
accuracy."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.corpus import pages_pdf, synth_pages, synth_pdf_doc
from invoice_extraction_spark.functions.html_blocks import parse_blocks
from invoice_extraction_spark.operators.blocks import (
    extract_block_features,
    fit_path_nb_weights,
    hashed_path_features,
    path_nb_score,
)
from parity import assert_parity, duck

N_PAGES = 32


@pytest.fixture(scope="module")
def block_df(spark):
    df = spark.createDataFrame(pages_pdf(N_PAGES))
    return extract_block_features(df).persist()


def test_export_matches_kernel(spark, block_df):
    """One exported row per kernel block, with identical features."""
    pages = synth_pages(N_PAGES)
    got = {
        (r["url"], r["block_idx"]): r
        for r in block_df.collect()
    }
    n_checked = 0
    for p in pages:
        for b in parse_blocks(p["html"]):
            r = got[(p["url"], b.idx)]
            assert r["tag"] == b.tag
            assert r["tag_path"] == b.tag_path
            assert r["region"] == b.region
            assert r["is_content"] == b.is_content
            assert r["n_tokens"] == b.n_tokens
            assert r["link_density"] == round(b.link_density, 4)
            n_checked += 1
    assert n_checked == len(got) > 200


def test_text_excluded_by_default_and_poison_skipped(spark):
    rows = [("u1", synth_pages(1)[0]["html"]), ("u2", None)]
    df = spark.createDataFrame(rows, "url string, html binary")
    out = extract_block_features(df).collect()
    assert all(r["text"] is None for r in out)
    assert {r["url"] for r in out} == {"u1"}  # poison row contributes nothing


def test_pdf_blocks_exported(spark):
    doc = synth_pdf_doc(1)
    df = spark.createDataFrame([(doc["url"], doc["html"])], "url string, html binary")
    out = extract_block_features(df, include_text=True).collect()
    assert len(out) > 3
    assert all(r["tag"] == "pdfline" for r in out)
    assert any(r["region"] == "boiler" for r in out)  # the folio line


BUCKET_SQL = """
WITH p AS (SELECT * FROM paths),
f AS (
  SELECT tag_path,
         list_filter(string_split(tag_path, '/'), s -> s <> '') AS segs
  FROM p
),
g AS (
  SELECT tag_path,
         segs || list_filter(
           list_transform(range(1, greatest(len(segs) - 1, 1) + 1),
                          i -> CASE WHEN i + 1 <= len(segs)
                               THEN segs[i] || '>' || segs[i + 1] END),
           x -> x IS NOT NULL) AS toks
  FROM f
)
SELECT tag_path, CAST(b AS INTEGER) AS bucket
FROM (
  SELECT DISTINCT tag_path,
         CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % 256 AS BIGINT) AS b
  FROM g, unnest(toks) AS u(t)
)
"""


def test_hashed_features_match_duckdb(spark, block_df):
    paths_pdf = (
        block_df.select("tag_path").distinct().toPandas()
    )
    con = duck()
    con.register("paths", paths_pdf)
    got = (
        spark.createDataFrame(paths_pdf)
        .select(
            "tag_path",
            F.explode(hashed_path_features(F.col("tag_path"))).alias("bucket"),
        )
    )
    assert_parity(got, con, BUCKET_SQL)
    con.close()


def test_fit_is_deterministic(spark, block_df):
    w1, p1 = fit_path_nb_weights(block_df)
    w2, p2 = fit_path_nb_weights(block_df)
    assert w1 == w2 and p1 == p2


def test_classifier_distills_the_rule(spark, block_df):
    """Structure-only NB must recover most of the rule's content/boiler
    split (the whole point of the distillation), and scoring is map-only."""
    weights, prior = fit_path_nb_weights(block_df)
    scored = block_df.select(
        "is_content",
        (path_nb_score(F.col("tag_path"), weights, prior) > 0).alias("pred"),
    )
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("is_content")).cast("double")).alias("acc")
    ).collect()[0]
    assert agg["acc"] > 0.75, agg["acc"]
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # literal weights: no join, no shuffle
