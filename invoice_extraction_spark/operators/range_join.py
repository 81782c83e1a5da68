"""Bucketed range join: point-in-interval joins that shuffle, not nest.

A plain ``points JOIN intervals ON p BETWEEN s AND e`` has no equi-key, so
Spark plans BroadcastNestedLoopJoin — O(|points| x |intervals|) compares,
the classic range-join scale cliff (events x sessions, ip x CIDR blocks,
timestamps x validity windows). The standard fix is bucketing: quantize
the axis into width-``w`` buckets, a point lands in exactly ONE bucket, an
interval is exploded to EVERY bucket it overlaps, and the join becomes an
ordinary hash equi-join on the bucket id plus a residual BETWEEN filter.
Each qualifying pair is found exactly once (the point's single bucket),
so no dedup pass is needed.

Cost model: the interval side grows by (interval_len / w) rows — pick w
near the TYPICAL interval length so most intervals explode to 1-2 buckets.
``max_buckets_per_interval`` refuses degenerate explosions loudly (an
interval spanning 10^6 buckets is a config error, not a workload); split
such outliers or raise ``w``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BUCKETS_PER_INTERVAL = 4096


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: float,
    how: str = "inner",
    max_buckets_per_interval: int = DEFAULT_MAX_BUCKETS_PER_INTERVAL,
) -> DataFrame:
    """Join rows of ``points`` to every interval containing them
    (``start <= p <= end``, inclusive). Output columns: all point columns +
    all interval columns (names must not collide apart from the join
    machinery). ``how='inner'`` or ``'left'`` (unmatched points kept with
    null interval columns).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    w = float(bucket_width)
    span_buckets = (
        F.floor(F.col(end_col) / w) - F.floor(F.col(start_col) / w) + 1
    )
    guarded = intervals.withColumn("_nb", span_buckets)
    # loud refusal beats a silent 10^6-row explosion per interval
    too_wide = guarded.filter(F.col("_nb") > max_buckets_per_interval)
    if too_wide.limit(1).count():
        worst = too_wide.agg(F.max("_nb")).collect()[0][0]
        raise ValueError(
            f"interval spans {worst} buckets (> {max_buckets_per_interval}); "
            f"raise bucket_width or split outlier intervals"
        )
    exploded = guarded.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    ).drop("_nb")
    keyed_points = points.withColumn("_bucket", F.floor(F.col(point_col) / w))
    joined = keyed_points.join(exploded, "_bucket", how)
    residual = F.col(start_col).isNull() | F.col(point_col).between(
        F.col(start_col), F.col(end_col)
    )
    if how == "inner":
        return joined.filter(
            F.col(point_col).between(F.col(start_col), F.col(end_col))
        ).drop("_bucket")
    # left: keep unmatched points; a bucket-matched-but-range-missed pair
    # must degrade to the null row, not disappear — null out the interval
    # side then keep one row per point when nothing matched
    matched = joined.filter(
        F.col(start_col).isNotNull()
        & F.col(point_col).between(F.col(start_col), F.col(end_col))
    ).drop("_bucket")
    unmatched = keyed_points.join(
        matched.select(*points.columns).distinct(), points.columns, "left_anti"
    ).drop("_bucket")
    for c in exploded.columns:
        if c not in ("_bucket", *points.columns):
            unmatched = unmatched.withColumn(c, F.lit(None))
    return matched.unionByName(unmatched)
