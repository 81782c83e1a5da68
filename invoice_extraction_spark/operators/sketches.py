"""Mergeable sketch rollups: incremental distinct counts and quantiles.

At 10^12 documents, "how many distinct urls so far" and "p99 document
length this month" must not cost a rescan of history. The standard answer
is mergeable sketches (Apache DataSketches, built into Spark 4): each
batch/snapshot aggregates into a small binary sketch, and any window of
history is answered by UNIONING sketches — bytes, not rows.

  - HLL for distinct counts (merging per-batch sketches estimates the
    concatenation within the sketch's error bound; small sketches answer
    exactly from sparse mode, so a union can differ from a single-pass
    sketch by a hair — both stay inside the bound);
  - KLL for quantiles (same mergeability, rank-error bounded).

The operational pattern this module supports: after each commit, sketch
ONLY the delta (``sources.atomic.read_appended``) and append the sketch
row to a tiny stats table; dashboards union sketches over any time range.
These are JVM-side aggregates — no Python, ordinary shuffles keyed by the
group columns.

No DuckDB oracle twins — sketch binaries are engine-specific — so these
carry pytest evidence instead: merge-vs-whole equality, error bounds
against exact answers, and the incremental-delta flow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_LGK = 12  # ~1.6KB sketches, ~1% relative error


def distinct_sketches(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """One HLL sketch per group (or one row total): the per-batch artifact
    to persist next to a snapshot."""
    agg = F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_distinct_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union sketch rows (across batches/snapshots) and estimate distincts —
    the no-rescan rollup. Input rows only need a ``sketch`` column."""
    agg = F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("n_distinct")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(agg)
    return sketches.agg(agg)


def quantile_sketches(
    df: DataFrame, value_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """One KLL(double) sketch per group for a numeric column — the
    mergeable alternative to exact ``percentile`` at history scale."""
    agg = F.kll_sketch_agg_double(F.col(value_col).cast("double")).alias("ksketch")
    if group_cols:
        return df.groupBy(*group_cols).agg(agg)
    return df.agg(agg)


def merge_quantile_estimate(
    sketches: DataFrame, probabilities: list[float], group_cols: list[str] | None = None
) -> DataFrame:
    """Merge KLL sketch rows and read quantiles at the given probabilities
    (one ``q_<p>`` column per probability). ``kll_sketch_merge_double`` is
    a binary scalar, so the many-row merge is a fold over the collected
    sketch list — fine at rollup cardinality (sketch rows are per-batch,
    thousands at most, ~KBs each)."""
    arr = F.collect_list("ksketch").alias("_arr")
    grouped = (
        sketches.groupBy(*group_cols).agg(arr) if group_cols else sketches.agg(arr)
    )
    # KLL merge results depend on merge ORDER (compaction is order-
    # sensitive) and collect_list order depends on partition arrival —
    # sort the sketch bytes first so the same store always folds to the
    # same quantiles
    a = F.array_sort(F.col("_arr"))
    merged = F.aggregate(
        F.slice(a, 2, F.greatest(F.size(a) - 1, F.lit(0))),
        F.element_at(a, 1),
        lambda acc, x: F.kll_sketch_merge_double(acc, x),
    )
    cols = [
        F.kll_sketch_get_quantile_double(merged, F.lit(float(p))).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probabilities
    ]
    return grouped.select(*(group_cols or []), *cols)
