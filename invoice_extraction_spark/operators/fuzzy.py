"""Fuzzy master-data matching (reference J2: validators.py:134-163).

The reference ships a RapidFuzz ``extractOne`` dealer-name validator (accept
if score >= 90) that is DEAD CODE — unreachable after the early return at
validators.py:132 — but documents the intended semantics. Here it's a working
operator: broadcast the (small) canonical dimension, score candidates with
Spark's built-in ``levenshtein`` (JVM-side, codegen'd — no Python), keep the
best match per row under a normalized-distance threshold.

Scale shape: dim is broadcast (master lists are KBs), so the "join" is a
map-side nested loop over a tiny table — no shuffle. The window top-1 runs on
(row_key) partitions that are already colocated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _norm(col):
    # the reference's compare normalization (validators.py:181-186):
    # collapse whitespace, uppercase, trim
    return F.upper(F.regexp_replace(F.trim(col), r"\s+", " "))


def fuzzy_join(
    df: DataFrame,
    dim: DataFrame,
    left_col: str,
    right_col: str,
    min_score: float = 0.9,
    keep_unmatched: bool = True,
) -> DataFrame:
    """Best fuzzy match per left row against a broadcast canonical dim.

    score = 1 - levenshtein(a, b) / max(len(a), len(b))  (RapidFuzz's
    normalized ratio family); rows keep their best match when
    score >= min_score, else null columns (or drop if keep_unmatched=False).
    """
    left = df.withColumn("_k", F.monotonically_increasing_id())
    a = _norm(F.col(left_col))
    b = _norm(F.col(right_col))
    scored = (
        left.join(F.broadcast(dim))
        .withColumn(
            "match_score",
            F.round(
                1.0
                - F.levenshtein(a, b).cast("double")
                / F.greatest(F.length(a), F.length(b), F.lit(1)).cast("double"),
                4,
            ),
        )
        .filter(F.col("match_score") >= min_score)
    )
    w = Window.partitionBy("_k").orderBy(F.desc("match_score"), F.col(right_col))
    best = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if keep_unmatched:
        matched_keys = best.select("_k")
        unmatched = left.join(matched_keys, "_k", "left_anti")
        for c in best.columns:
            if c not in unmatched.columns:
                unmatched = unmatched.withColumn(
                    c, F.lit(None).cast(dict(best.dtypes)[c])
                )
        best = best.unionByName(unmatched.select(best.columns))
    return best.drop("_k")


def validate_sellers(extracted: DataFrame, master_sellers: DataFrame) -> DataFrame:
    """The reference's intended dealer validation, working: fuzzy-match the
    extracted seller span against the canonical seller list; emit
    ``seller_canonical`` + ``seller_match_score`` (>=0.9 accepted,
    validators.py:158)."""
    with_seller = extracted.withColumn("_seller", F.col("fields.seller.value"))
    out = fuzzy_join(
        with_seller.filter(F.col("_seller").isNotNull()),
        master_sellers.select(F.col("seller_name")),
        "_seller",
        "seller_name",
        min_score=0.9,
    )
    return out.withColumnRenamed("seller_name", "seller_canonical").drop("_seller")
