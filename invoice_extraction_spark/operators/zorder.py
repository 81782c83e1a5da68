"""Z-order clustering: multi-column data layout for file skipping.

Range-sorting a table on ONE column gives that column tight per-file
min/max ranges (and so file skipping — ``sources/atomic`` stats+prune),
but leaves every OTHER column's ranges wide. Z-ordering (the Iceberg /
Delta ``OPTIMIZE ZORDER BY`` idea) interleaves the bits of several
columns into one sort key, so EACH participating column gets locality —
per-file ranges shrink on all of them at once, and bounds-pruning works
for queries filtering on any subset.

Implementation is a pure Column program (JVM-side, codegen):

  1. rank-normalize each column to a bounded integer domain via
     ``percent_rank`` (rank-based, so skew and outliers cannot collapse
     the grid — the standard trick production z-ordering uses);
  2. interleave the top ``bits`` bits of each normalized value into one
     long (``shiftleft``/bitwise-or fold);
  3. ``repartitionByRange`` + ``sortWithinPartitions`` on the z-value.

The percent_rank pass is one window over an unpartitioned sort per
column — at full-corpus scale, compute the rank boundaries on a sample
and assign by range join instead; this direct form is exact and fine for
per-snapshot layout jobs (data written per commit, not the whole table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BITS = 8  # 8 bits/column: 256 strata each — plenty for file-level skipping


def z_value(df: DataFrame, cols: list[str], bits: int = DEFAULT_BITS) -> DataFrame:
    """Add ``_z``: the interleaved-bits key over ``cols`` (2-4 columns is
    the useful range — beyond that, per-column resolution drops fast)."""
    out = df
    quantized = []
    for c in cols:
        q = f"_q_{c}"
        w = Window.orderBy(F.col(c))
        out = out.withColumn(
            q,
            F.least(
                (F.percent_rank().over(w) * (1 << bits)).cast("long"),
                F.lit((1 << bits) - 1),
            ),
        )
        quantized.append(q)
    z = F.lit(0).cast("long")
    one = F.lit(1).cast("long")
    for bit in range(bits - 1, -1, -1):  # MSB first
        for q in quantized:
            # Column.bitwiseOR/AND — Python's |/& on Columns are LOGICAL ops
            z = F.shiftleft(z, 1).bitwiseOR(
                F.shiftright(F.col(q), bit).bitwiseAND(one)
            )
    return out.withColumn("_z", z).drop(*quantized)


def zorder_layout(
    df: DataFrame, cols: list[str], n_files: int = 16, bits: int = DEFAULT_BITS
) -> DataFrame:
    """Lay ``df`` out for multi-column skipping: range-partition + sort on
    the z-value, drop the key. Feed the result straight to
    ``commit_append(..., stats_cols=cols)`` — each output file then covers
    a compact hyper-rectangle of the column space, so ``read_table``
    bounds-pruning skips files for filters on ANY of ``cols``."""
    return (
        z_value(df, cols, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
    )
