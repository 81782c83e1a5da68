"""Sequence packing: assign documents to fixed-token-budget training packs.

LLM pretraining consumes fixed-length contexts (2k/4k/8k tokens); the
pipeline step that turns a filtered corpus into training rows is *packing*
— concatenate documents until the context budget is full, start the next
pack. This module implements the streaming-packing semantics used by most
production loaders ("greedy in order, overflow allowed"): a document joins
the pack that was open when it arrived, i.e.

    pack_seq = floor(cumulative_tokens_before_doc / budget)

Documents that straddle a boundary overflow their pack (the downstream
tokenizer truncates or splits at token granularity — byte-level splitting
is not the engine's business). These semantics are exactly one window
cumulative sum, so packing is a pure Column program — deterministic,
oracle-checkable in ANSI SQL, and free of Python.

Scale shape: the window partitions by a shard column (a hash split,
date, or source bucket — anything with bounded per-shard volume), so the
sort behind the cumsum is per-shard, never global. Pack ids are
``shard#seq`` strings: globally unique without any cross-shard
coordination, which is what lets 1000 executors pack independently.
Cross-shard packing order is deliberately unspecified — training shuffles
packs anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUDGET = 2048


def pack_documents(
    df: DataFrame,
    token_col: str,
    budget: int = DEFAULT_BUDGET,
    shard_col: str = "shard",
    order_col: str = "url",
) -> DataFrame:
    """Add ``pack_id`` (shard#seq), ``pack_seq`` and ``pack_offset`` (token
    offset of this doc within its pack's budget window) to ``df``.

    ``order_col`` must be unique per shard (url is) — a total order makes
    the assignment reproducible run-over-run regardless of partitioning.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    seq = F.floor(cum_before / F.lit(budget))
    return (
        df.withColumn("_cum_before", cum_before)
        .withColumn("pack_seq", seq)
        .withColumn(
            "pack_id", F.concat_ws("#", F.col(shard_col).cast("string"), seq)
        )
        .withColumn("pack_offset", (F.col("_cum_before") % F.lit(budget)).cast("long"))
        .drop("_cum_before")
    )


def pack_stats(packed: DataFrame, budget: int = DEFAULT_BUDGET, token_col: str = "n_tokens") -> DataFrame:
    """Per-pack rollup: docs, tokens, fill ratio (>1 = overflowed pack).
    The observability rollup a loader team reads before training: mean fill
    near 1.0 and a thin overflow tail means the budget is sized right."""
    return packed.groupBy("pack_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_col).cast("bigint").alias("pack_tokens"),
        F.round(F.sum(token_col) / F.lit(float(budget)), 4).alias("fill_ratio"),
    )


def packing_summary(packed: DataFrame, budget: int = DEFAULT_BUDGET, token_col: str = "n_tokens") -> DataFrame:
    """One-row corpus summary: packs, docs/pack, token utilisation (tokens
    over pack-slots used — the fraction of training compute doing useful
    work), overflow-pack fraction."""
    per_pack = pack_stats(packed, budget, token_col)
    return per_pack.agg(
        F.count("*").alias("n_packs"),
        F.round(F.avg("n_docs"), 4).alias("avg_docs_per_pack"),
        F.round(
            F.sum("pack_tokens") / (F.count("*") * F.lit(float(budget))), 4
        ).alias("token_utilisation"),
        F.round(F.avg((F.col("fill_ratio") > 1.0).cast("double")), 4).alias(
            "overflow_pack_frac"
        ),
    )
