"""Count-min sketch: mergeable frequency estimates and heavy hitters.

The sketch family next to HLL (distincts) and KLL (quantiles) in
``operators/sketches.py``: approximate COUNTS per item. At 10^12 documents
"which tokens/domains are hottest so far" must not cost a full groupBy over
history — the CMS answer is a d×w count matrix per batch (Cormode &
Muthukrishnan 2005) that merges by cell-wise addition, so any window of
history is answered by summing tiny sketches, never rescanning text.

Representation is SPARSE RELATIONAL: a sketch is a DataFrame of
``(depth, bucket, n)`` rows (≤ d·w of them, zero cells omitted). That
keeps every step a plain Spark op:

  - build: explode each value into its d (depth, bucket) cells (bucket =
    ``xxhash64(value, seed_i) mod w``) and run ONE groupBy with map-side
    combine — one shuffle of (int, int) pairs, never values;
  - merge: union sketch rows + groupBy-sum — EXACT (counts add), so
    merge-of-batches equals sketch-of-whole bit-for-bit;
  - estimate: the sketch is ≤ d·w rows → broadcast join against the probe
    items, min over depths (the classic CMS upper-bound read).

Guarantee: estimate ≥ true count always (collisions only add), and
estimate ≤ true + εN with probability ≥ 1-δ for ε = e/width,
δ = e^-depth (N = total items sketched).

CMS cannot ENUMERATE items — heavy-hitter extraction pairs the sketch
with a candidate set assembled from each batch's LOCAL top-N (cheap: the
batch is small even when history is not; any global heavy hitter is a
local heavy hitter in the batches where it occurs). Estimating candidates
against the merged sketch then ranks them with full-history counts.

No DuckDB oracle twin (sketch cells are engine-seeded hashes); pytest
carries the evidence: merge==whole equality, the ε-bound against exact
counts on a Zipfian corpus, and heavy-hitter agreement with the exact
top-k (mirrors test_sketches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DEPTH = 4
DEFAULT_WIDTH = 4096
_SEED = 7001  # depth i hashes with seed _SEED + i


def _cells(value, depth: int, width: int):
    """The d (depth, bucket) cells a value touches."""
    return [
        F.struct(
            F.lit(i).alias("depth"),
            F.pmod(F.xxhash64(value, F.lit(_SEED + i)), F.lit(width))
            .cast("int")
            .alias("bucket"),
        )
        for i in range(depth)
    ]


def cms_sketch(
    df: DataFrame,
    value_col: str = "value",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Sketch one batch of values: ``(depth, bucket, n)`` rows. ONE shuffle
    on (depth, bucket) ints with map-side combine; ≤ depth·width rows out
    regardless of input size — the per-batch artifact to persist."""
    v = F.col(value_col)
    return (
        df.select(F.explode(F.array(*_cells(v, depth, width))).alias("c"))
        .groupBy(F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
        .agg(F.count("*").alias("n"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge sketch rows across batches (union the per-batch frames first).
    Counts add cell-wise, so this is EXACTLY the sketch of the
    concatenation — groupBy-sum over ≤ d·w·n_batches tiny rows."""
    return sketches.groupBy("depth", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    value_col: str = "value",
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query a (merged) sketch for each distinct item: min over the
    item's d cells. The sketch broadcasts (≤ d·w rows); absent cells read
    as 0. depth/width MUST match the build parameters."""
    v = F.col(value_col)
    probes = (
        items.select(value_col)
        .distinct()
        .select(value_col, F.explode(F.array(*_cells(v, depth, width))).alias("c"))
        .select(value_col, F.col("c.depth").alias("depth"), F.col("c.bucket").alias("bucket"))
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(value_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est"))
    )


def local_top_candidates(
    df: DataFrame, value_col: str = "value", n: int = 256
) -> DataFrame:
    """A batch's local top-n values with local counts — the candidate rows
    persisted next to its sketch. groupBy over the BATCH only (small by
    construction) + TakeOrderedAndProject; deterministic tie-break on the
    value."""
    return (
        df.groupBy(value_col)
        .agg(F.count("*").alias("n_local"))
        .orderBy(F.desc("n_local"), F.asc(value_col))
        .limit(n)
    )


def cms_heavy_hitters(
    sketch: DataFrame,
    candidates: DataFrame,
    value_col: str = "value",
    k: int = 32,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Global top-k: estimate the (unioned, deduped) candidate set against
    the merged sketch and rank by the full-history estimate. Any value that
    is globally heavy is locally heavy somewhere, so the candidate union
    covers the true top-k whenever per-batch top-n is sized sensibly."""
    est = cms_estimate(sketch, candidates, value_col, depth, width)
    return est.orderBy(F.desc("est"), F.asc(value_col)).limit(k)
