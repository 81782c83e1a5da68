"""Skew-aware joins: salting for hot keys when broadcast isn't an option.

A hash join shuffles both sides on the key, so one hot key (a mega-host,
an empty-string default, a null sentinel) pins its entire volume on one
task — the straggler that turns a 10-minute stage into a 10-hour one.
When the small side fits in memory, ``F.broadcast`` avoids the shuffle
entirely (preferred; used throughout this repo). When BOTH sides are too
big, the standard fix is salting:

  big side  : key -> (key, salt) with salt = deterministic hash of the
              whole row mod S (uniform routing; using the row, not the
              key, is what actually splits a hot key);
  other side: each row replicated S times, one per salt value;
  join      : ordinary equi-join on (key, salt) — the hot key's volume
              now spreads across S tasks.

Replication costs S x |other side|, which is why S stays small (8-32) and
why this targets the big-x-medium case. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles mild skew at runtime; explicit
salting is for the pathological keys AQE can't split finely enough (a
single key bigger than executor memory). The join RESULT is provably
independent of the salt (tested against the plain join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    big: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
    seed: int = 42,
) -> DataFrame:
    """Equi-join ``big`` (skewed side) with ``other`` on ``key`` via
    (key, salt). Supports inner/left (left = big side preserved)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.lit(seed)), F.lit(n_salts)
    ).cast("int")
    salted_big = big.withColumn("_salt", salt)
    replicated = other.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big.join(replicated, [key, "_salt"], how).drop("_salt")


def key_skew_report(df: DataFrame, key: str, top_n: int = 10) -> DataFrame:
    """Planning-time observability: the share of rows held by the heaviest
    keys — read this BEFORE picking broadcast / AQE / salting. A top key
    above ~1/partitions of the table is a straggler in waiting."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("n_rows"))
        .withColumn("row_share", F.round(F.col("n_rows") / F.lit(float(total)), 4))
        .orderBy(F.desc("n_rows"), key)
        .limit(top_n)
    )
