"""Deterministic hash-based sampling — the reproducible way to sample at
10^12-document scale.

RNG-based sampling (``df.sample``/``sampleBy``) is seed-deterministic only
per partitioning; re-running after a repartition or on a different cluster
yields a different sample, which poisons train/eval reproducibility. Hashing
a stable key instead makes membership a pure function of the ROW — the same
document lands in the same split on any cluster, any partitioning, forever.
Both operators are pure Column/window plans and have DuckDB oracle twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash_key(key_col: Column, seed: int) -> Column:
    """md5 over (seed, key) — portable (same function in DuckDB), uniform,
    and stable across partitionings/engines (unlike xxhash64's seed arg,
    md5 hex compares identically everywhere)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), key_col.cast("string")))


def hash_quota_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum, chosen by hash order —
    deterministic quota sampling (e.g. cap every source/language at N docs
    so one crawl host can't dominate the training mix).

    Plan: one window (rank over md5 order) per stratum — a single shuffle
    keyed on the stratum. Strata are bounded-cardinality (languages,
    sources), so no skew pathology; for huge strata the window only ever
    keeps a running rank, never materializes the sort globally.
    """
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_key(F.col(key_col), seed), F.col(key_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def hash_split(
    df: DataFrame,
    key_col: str = "doc_id",
    val_pct: int = 10,
    test_pct: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Adds a ``split`` column (train/val/test) as a pure function of the
    row key: bucket = first 8 md5 hex chars mod 100. Map-only — zero
    shuffles — and contamination-proof: a document can never migrate
    between splits across runs, reshards, or engines."""
    bucket = F.conv(F.substring(_hash_key(F.col(key_col), seed), 1, 8), 16, 10).cast(
        "long"
    ) % 100
    split = (
        F.when(bucket < val_pct, "val")
        .when(bucket < val_pct + test_pct, "test")
        .otherwise("train")
    )
    return df.withColumn("split", split)


MIXTURE_BUCKETS = 10_000  # 0.01% rate resolution


def mixture_sample(
    df: DataFrame,
    stratum_col: str,
    keep_fractions: dict[str, float],
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum down-sampling to hit a target data mixture
    (the pretraining-mix reweighting step: e.g. keep 100% of books, 30% of
    common-crawl, 5% of a low-quality source). ``keep_fractions`` maps
    stratum value -> keep rate in [0, 1]; strata not listed keep everything.

    Map-only, zero shuffles: membership = (md5 bucket of the row key) <
    rate * 10000 — a pure function of the row, so the SAME documents
    survive on any cluster, any partitioning, any engine (the DuckDB twin
    computes the identical set). Nested sampling composes: a stratum
    sampled at 0.3 then re-sampled at 0.5 keeps exactly the 0.15 prefix of
    the same hash order ONLY if seeds differ — reuse one seed per pipeline
    stage, never the same seed twice on the same key.
    """
    bucket = F.conv(F.substring(_hash_key(F.col(key_col), seed), 1, 8), 16, 10).cast(
        "long"
    ) % MIXTURE_BUCKETS
    rate = None
    for value, frac in sorted(keep_fractions.items()):
        thresh = int(round(frac * MIXTURE_BUCKETS))
        cond = (F.col(stratum_col) == value) & (bucket < thresh)
        rate = cond if rate is None else (rate | cond)
    unlisted = ~F.col(stratum_col).isin(list(keep_fractions.keys()))
    keep = unlisted if rate is None else (unlisted | rate)
    return df.filter(keep)
