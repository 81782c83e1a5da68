"""Benchmark decontamination: flag training documents that verbatim-overlap
an evaluation set.

The GPT-3/PaLM-style pipeline step (Brown et al. 2020 Appendix C use
13-gram overlap; smaller n for short-text benchmarks): before training,
every document is checked for word n-grams that also appear in any held-out
benchmark, and overlapping documents are dropped or flagged — otherwise
eval numbers silently measure memorization.

Physical shape, designed for 10^12 training docs vs a ~10^5-doc benchmark
suite: the BENCHMARK side is tiny, so its distinct n-gram hashes broadcast
to every executor and the corpus is scored in one map-side pass plus the
per-doc re-aggregation — the training corpus never shuffles on n-grams and
never compares doc-to-doc (contrast `dedup.cross_doc_contamination`, which
builds the full corpus-wide inverted index because BOTH sides are big).
Hashes are md5 hex (32-char) so only tiny strings move, and the DuckDB
oracle computes the identical value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.parallelism import ensure_min_parallelism
from .dedup import _ngram_slots

DEFAULT_NGRAM = 8  # 13 is the GPT-3 figure for web-scale prose; 8 keeps
# short-document benchmarks (single-sentence QA items) detectable


def benchmark_ngram_index(
    bench_df: DataFrame, text_col: str = "text", n: int = DEFAULT_NGRAM
) -> DataFrame:
    """Distinct md5(n-gram) hashes of the benchmark suite — the small frame
    to broadcast (persist it once per eval-suite release; it only changes
    when the benchmarks do)."""
    return (
        bench_df.select(F.explode(_ngram_slots(F.col(text_col), n)).alias("g"))
        .select(F.md5("g").alias("gh"))
        .distinct()
    )


def benchmark_contamination(
    df: DataFrame,
    bench_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
) -> DataFrame:
    """Per-document overlap with the benchmark suite: total n-gram slots,
    slots whose n-gram appears in the benchmark index, and the fraction.

    ``bench_index`` is ``benchmark_ngram_index(...)`` (or a re-read of its
    persisted output). It is broadcast — corpus-side grams never shuffle.
    """
    df = ensure_min_parallelism(df)
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(_ngram_slots(F.col(text_col), n)).alias("g"),
    ).select("id", F.md5("g").alias("gh"))
    hit = F.broadcast(bench_index.withColumn("_hit", F.lit(1)))
    return (
        grams.join(hit, "gh", "left")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_slots"),
            F.sum(F.coalesce("_hit", F.lit(0)).cast("long")).alias("n_bench_slots"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_slots",
            "n_bench_slots",
            F.round(
                F.col("n_bench_slots") / F.col("n_slots").cast("double"), 4
            ).alias("bench_overlap"),
        )
    )


def decontaminate(
    df: DataFrame,
    bench_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = DEFAULT_NGRAM,
    max_overlap: float = 0.0,
) -> DataFrame:
    """Drop documents whose benchmark overlap exceeds ``max_overlap``
    (default 0.0 = any shared n-gram disqualifies — the conservative
    published practice). Returns the clean corpus with original columns."""
    index = benchmark_ngram_index(bench_df, text_col, n)
    scores = benchmark_contamination(df, index, text_col, id_col, n)
    dirty = scores.filter(F.col("bench_overlap") > max_overlap).select(id_col)
    return df.join(dirty, id_col, "left_anti")
