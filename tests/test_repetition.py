"""Gopher-style repetition signals: hand-crafted docs with known token math,
and the gate's drop-the-spam behavior."""

import pandas as pd
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.text_metrics import (
    dup_token_fraction,
    max_bigram_count,
    repetition_keep,
    top_bigram_fraction,
)


def _df(spark):
    rows = [
        (0, "a b c d e f g h"),                    # all distinct: dup 0
        (1, "spam spam spam spam spam spam"),       # one token: dup 5/6
        (2, "x y x y x y x y"),                     # "x y" bigram dominates
        (3, "w"),                                   # single token edge
        (4, ""),                                    # empty edge
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_repetition_math(spark):
    got = {
        r["doc_id"]: r
        for r in _df(spark)
        .select(
            "doc_id",
            dup_token_fraction("text").alias("dup"),
            max_bigram_count("text").alias("mb"),
            top_bigram_fraction("text").alias("tb"),
        )
        .collect()
    }
    assert got[0]["dup"] == 0.0 and got[0]["mb"] == 1
    assert got[1]["dup"] == round(5 / 6, 4)
    assert got[1]["mb"] == 5  # "spam spam" x5
    assert got[1]["tb"] == 1.0
    # "x y x y x y x y": bigrams = x y, y x, x y, y x, x y, y x, x y -> max 4/7
    assert got[2]["mb"] == 4
    assert got[2]["tb"] == round(4 / 7, 4)
    assert got[3]["dup"] == 0.0 and got[3]["mb"] == 1
    assert got[4]["dup"] == 0.0  # empty text degrades, never errors


def test_repetition_gate_drops_spam(spark):
    kept = {
        r["doc_id"]: r["keep"]
        for r in _df(spark).select("doc_id", repetition_keep("text").alias("keep")).collect()
    }
    assert kept[0] is True
    assert kept[1] is False  # token spam
    assert kept[2] is False  # bigram spam
    assert kept[3] is True


def test_repetition_is_pure_column(spark):
    from invoice_extraction_spark.plans.explain import has_row_python_udf

    q = _df(spark).select(repetition_keep("text"), F.col("doc_id"))
    assert not has_row_python_udf(q)


def test_fast_kernel_equals_column_forms(spark):
    """repetition_stats_fast (Arrow) must agree EXACTLY with the Column
    reference forms — including half-up 4-dp rounding — on the corpus and
    on adversarial edge strings. The fast path is what corpus-wide gates
    (q:repetition_filter_counts, curate --repetition-gate, datacard) run:
    the HOF fold is interpreted per element and was measured ~40 ms/doc."""
    from pyspark.sql import functions as F

    from invoice_extraction_spark.functions.text_metrics import (
        dup_token_fraction,
        max_bigram_count,
        repetition_keep,
        repetition_keep_fast,
        repetition_stats_fast,
        top_bigram_fraction,
    )

    edges = [
        "", "a", "a a", "a b", "a  b ", "x y x y x y x y",
        "one two three two three two", "  ", "solo", None,
    ]
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text")
        .union(spark.createDataFrame([(t,) for t in edges], "text string"))
    )
    s = repetition_stats_fast("text")
    rows = docs.select(
        "text",
        s["dup_token_frac"].alias("fd"),
        s["top_bigram_frac"].alias("ft"),
        s["max_bigram_n"].alias("fm"),
        dup_token_fraction("text").alias("cd"),
        top_bigram_fraction("text").alias("ct"),
        max_bigram_count("text").alias("cm"),
        repetition_keep_fast(s).alias("fk"),
        repetition_keep("text").alias("ck"),
    ).collect()
    assert rows
    for r in rows:
        assert (r["fd"], r["ft"], r["fm"], r["fk"]) == (
            r["cd"], r["ct"], r["cm"], r["ck"],
        ), r["text"][:60]
