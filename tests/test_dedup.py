"""Dedup operator semantics: fast Arrow MinHash == reference Column MinHash;
LSH finds planted near-duplicates; exact dedup keeps min id."""

import pandas as pd
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.dedup import (
    dedup_exact,
    lsh_candidate_pairs,
    minhash_signature,
    minhash_signature_fast,
    ngram_jaccard_pairs,
)


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tonight")),  # near dup of 0
        (3, "completely different words about tractors invoices and monsoon harvests"),
        (4, "short text"),
    ]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def test_fast_minhash_equals_column_minhash(spark):
    d = _docs(spark)
    a = d.select("doc_id", minhash_signature(F.col("text"), 6).alias("sig")).collect()
    b = d.select("doc_id", minhash_signature_fast(F.col("text"), 6).alias("sig")).collect()
    assert {r["doc_id"]: r["sig"] for r in a} == {r["doc_id"]: r["sig"] for r in b}


def test_lsh_finds_planted_near_dups(spark):
    d = _docs(spark)
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(d).collect()}
    assert (0, 1) in pairs  # exact dup always shares all bands
    assert (0, 2) in pairs or (1, 2) in pairs  # near dup shares >=1 band
    assert (0, 3) not in pairs and (1, 3) not in pairs  # unrelated


def test_jaccard_verify_filters_candidates(spark):
    d = _docs(spark)
    verified = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(d, threshold=0.5).collect()
    }
    assert verified[(0, 1)] == 1.0
    assert all(j >= 0.5 for j in verified.values())


def test_dedup_exact_keeps_min_id(spark):
    d = _docs(spark)
    kept = sorted(r["doc_id"] for r in dedup_exact(d).collect())
    assert kept == [0, 2, 3, 4]  # doc 1 (dup of 0) dropped
