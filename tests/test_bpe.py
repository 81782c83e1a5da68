"""BPE tokenizer: textbook-example training, round-trip decode,
deterministic fit, Arrow kernel vs driver-side encode, packing with real
counts."""

import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.functions.bpe import (
    END,
    bpe_token_count_udf,
    decode_tokens,
    encode_word,
    fit_bpe,
    train_bpe_merges,
)


def test_textbook_training():
    """The classic worked example: with 'low' dominating, early merges
    build 'low' bottom-up; ties break lexicographically."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(freqs, 4)
    # 'es' appears 9x (newest+widest) — top pair; then 'est' 9x, 'est</w>' 9x,
    # then 'lo' 7x
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", END)
    assert merges[3] == ("l", "o")


def test_encode_round_trip_and_greedy_order():
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_bpe_merges(freqs, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in freqs:
        toks = encode_word(w, ranks)
        assert decode_tokens(toks) == w
        assert all(t for t in toks)
    # a trained word compresses below char count; an unseen word still encodes
    assert len(encode_word("newest", ranks)) < len("newest") + 1
    assert decode_tokens(encode_word("zzzqqq", ranks)) == "zzzqqq"


def test_fit_deterministic_on_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = fit_bpe(docs, n_merges=64)
    b = fit_bpe(docs, n_merges=64)
    assert a == b and len(a) == 64


def test_udf_matches_driver_side_encode(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    merges = fit_bpe(docs, n_merges=64)
    ranks = {p: i for i, p in enumerate(merges)}
    got = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id", bpe_token_count_udf(merges)(F.col("text")).alias("n")
        ).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = sum(
            len(encode_word(w, ranks)) for w in r["text"].lower().split(" ") if w
        )
        assert got[r["doc_id"]] == want


def test_real_counts_drive_packing(spark):
    """Real BPE counts slot straight into pack_documents — the packing
    budget becomes exact token economics instead of an estimate."""
    from invoice_extraction_spark.operators.packing import pack_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(100)
    merges = fit_bpe(docs, n_merges=64)
    with_counts = docs.withColumn("n_tokens", bpe_token_count_udf(merges)(F.col("text")))
    packed = pack_documents(with_counts, "n_tokens", 512, "source", "doc_id")
    assert packed.filter("pack_offset >= 512").count() == 0
    assert packed.select("pack_id").distinct().count() >= 1
    # compression sanity: BPE tokens per doc sit between chars and words
    row = with_counts.selectExpr(
        "avg(n_tokens) AS t",
        "avg(CASE WHEN length(text)=0 THEN 0 ELSE size(split(text, ' ')) END) AS w",
        "avg(length(text)) AS c",
    ).collect()[0]
    assert row["w"] < row["t"] < row["c"]
