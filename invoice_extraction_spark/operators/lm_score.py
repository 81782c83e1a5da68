"""Unigram language-model quality scoring (the CCNet idea, Spark-first).

CCNet (Wenzek et al. 2020) ranks Common-Crawl documents by language-model
perplexity: fluent prose scores low, boilerplate/gibberish scores high, and
the tail gets dropped or down-weighted before training. The full KenLM is a
5-gram model; the *pipeline shape* — fit a model on (a sample of) the
corpus, broadcast it, score every document map-side — is what matters at
100 TB, and a unigram model keeps every step an exact, oracle-checkable
DataFrame program (no external model artifacts, no Python in the hot path).

Physical plan, designed for 10^12 documents:

  fit  : explode tokens -> ONE hash groupBy (map-side partial counts) ->
         top-K vocab (TakeOrdered, K<=50k) -> a tiny (token, logp) frame.
  score: explode tokens -> BROADCAST join against the vocab (never a
         shuffle of the corpus on token) -> re-agg by doc key (the one
         unavoidable shuffle, keyed by the doc id, AQE-coalesced).

Fitting on a hash-sample of the corpus (``fit_fraction``) is the scale
path: unigram frequencies converge long before 10^12 docs, so the fit cost
is O(sample), not O(corpus) — mirrors the round-2 IVF sampled-fit fix.

Smoothing: logp(token) = ln(count / total) over the fitted vocab;
out-of-vocabulary tokens get ln(oov_mass / total) with ``oov_mass = 0.5``
(a half-count — Jeffreys-style). All floats rounded late, never in the
model itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_metrics import tokens

DEFAULT_VOCAB_SIZE = 50_000
OOV_MASS = 0.5


def _doc_tokens(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
    """One row per (doc, token), lowercased; empty docs contribute nothing."""
    return df.select(
        *keep, F.explode(tokens(F.lower(F.col(text_col)))).alias("token")
    ).filter(F.col("token") != "")


def fit_unigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = DEFAULT_VOCAB_SIZE,
    fit_fraction: float | None = None,
    sample_seed: int = 42,
) -> DataFrame:
    """Fit the unigram model: ``(token, logp)`` for the top-``vocab_size``
    tokens by corpus frequency (ties broken by token ascending — fully
    deterministic), plus one ``__oov__`` row carrying the OOV log-prob.

    ``fit_fraction`` fits on a deterministic hash sample of documents (the
    100-TB path); None fits on everything (exact, used by the oracle
    parity tests). ``total`` is the token count of the FITTED corpus, so
    probabilities always sum <= 1 over vocab + OOV mass.
    """
    fit_df = df
    if fit_fraction is not None:
        # membership is a pure function of the text hash — reproducible
        # regardless of partitioning (same contract as operators/sampling.py)
        bucket = F.pmod(F.xxhash64(F.col(text_col), F.lit(sample_seed)), F.lit(10_000))
        fit_df = df.filter(bucket < int(fit_fraction * 10_000))
    counts = (
        _doc_tokens(fit_df, text_col, keep=[])
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    vocab = (
        counts.orderBy(F.desc("n"), F.asc("token"))
        .limit(vocab_size)
        .withColumn("_k", F.lit(1))
        # 1-row total attached via a broadcast lit(1) equi-join (a literal
        # scalar, not a join fan-out)
        .join(F.broadcast(total.withColumn("_k", F.lit(1))), "_k")
        .select("token", F.log(F.col("n").cast("double") / F.col("t")).alias("logp"))
    )
    oov = total.select(
        F.lit("__oov__").alias("token"),
        F.log(F.lit(OOV_MASS) / F.col("t")).alias("logp"),
    )
    return vocab.unionByName(oov)


def lm_quality(
    df: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    id_col: str = "url",
) -> DataFrame:
    """Score every document against a fitted model: per-doc mean token
    log-prob and ``pseudo_perplexity = exp(-mean_logp)`` (lower = more
    fluent under the corpus model — CCNet's ranking key), rounded to 4.

    The model side is always broadcast (<= vocab_size+1 rows); the only
    shuffle is the re-aggregation keyed by ``id_col``.
    """
    model = lm.filter(F.col("token") != "__oov__")
    oov = lm.filter(F.col("token") == "__oov__").select(F.col("logp").alias("_oov_logp"))
    tok = _doc_tokens(df, text_col, keep=[id_col])
    joined = (
        tok.withColumn("_k", F.lit(1))
        .join(F.broadcast(model), "token", "left")
        .join(F.broadcast(oov.withColumn("_k", F.lit(1))), "_k")  # 1-row scalar
        .select(id_col, F.coalesce("logp", "_oov_logp").alias("logp"))
    )
    return joined.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        F.round(F.avg("logp"), 4).alias("mean_logp"),
        F.round(F.exp(-F.avg("logp")), 4).alias("pseudo_perplexity"),
    )


def lm_quality_buckets(scored: DataFrame, edges: list[float]) -> DataFrame:
    """Histogram of pseudo-perplexity over explicit bucket edges — the
    'head / middle / tail' CCNet split as an aggregate query. ``edges``
    must be ascending; docs >= the last edge land in the overflow bucket."""
    conds = F.when(F.col("pseudo_perplexity") < edges[0], F.lit(f"<{edges[0]:g}"))
    for lo, hi in zip(edges, edges[1:]):
        conds = conds.when(
            F.col("pseudo_perplexity") < hi, F.lit(f"{lo:g}-{hi:g}")
        )
    bucket = conds.otherwise(F.lit(f">={edges[-1]:g}"))
    return (
        scored.select(bucket.alias("ppl_bucket"))
        .groupBy("ppl_bucket")
        .agg(F.count("*").alias("n_docs"))
    )
