"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k as the exact baseline, plus a sign-LSH bucketed
variant as the scale path (task brief: "IVF or LSH-bucketed variant").

Scale notes:
- dot/norm are `zip_with` + `aggregate` Column folds — JVM-side, no Python;
- brute-force is a map-only scan + TakeOrderedAndProject (top-k never
  materializes the full sorted set);
- the LSH variant buckets vectors by the sign pattern of `n_planes` seeded
  random hyperplanes computed ONCE driver-side from a fixed seed; the probe
  touches only matching buckets — at 10^12 vectors the scan drops by
  ~2^n_planes while staying deterministic.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Deterministic tie-break by id. Similarity rounded to 4 so results are
    stable across float summation orders (and hash-comparable vs the oracle).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    out = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col), q), 4).alias("cos_sim"),
    )
    return out.orderBy(F.desc("cos_sim"), F.col(id_col)).limit(k)


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket_expr(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket key: one '0'/'1' char per hyperplane."""
    return F.concat_ws(
        "",
        *[
            F.when(dot(vec_col, F.array(*[F.lit(w) for w in p])) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes
        ],
    )


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: scan only the query's sign-LSH bucket.

    With 4 planes this prunes ~15/16 of the corpus before any distance math;
    recall is traded for scan cost exactly as an IVF probe-1 search would.
    """
    planes = _hyperplanes(len(query_vec), n_planes, seed)
    q_bucket = "".join(
        "1" if sum(w * x for w, x in zip(p, query_vec)) >= 0 else "0" for p in planes
    )
    bucketed = df.withColumn("_bucket", lsh_bucket_expr(F.col(vec_col), planes))
    return brute_force_topk(
        bucketed.filter(F.col("_bucket") == q_bucket), query_vec, k, vec_col, id_col
    )


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """IVF (inverted-file) ANN: k-means coarse quantizer, probe the n_probe
    cells nearest the query, exact cosine within them.

    The second scale path next to sign-LSH: at 10^12 vectors the quantizer is
    trained on a sample, cell assignment is a map-side model.transform, and a
    probe touches n_probe/n_cells of the corpus. Deterministic given the
    seed + input (train on the same table). Not SQL-expressible -> rows-only
    oracle check.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = df.withColumn("_fv", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_fv", predictionCol="_cell").fit(feat)
    centers = model.clusterCenters()

    def _cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * (sum(y * y for y in b) ** 0.5)
        return num / den if den else 0.0

    probe_cells = sorted(
        range(len(centers)), key=lambda i: -_cos(list(centers[i]), query_vec)
    )[:n_probe]
    assigned = model.transform(feat)
    candidates = assigned.filter(F.col("_cell").isin(probe_cells)).drop("_fv", "_cell")
    return brute_force_topk(candidates, query_vec, k, vec_col, id_col)


def pairwise_topk_per_label(
    df: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Centroid-nearest per label group: for each label, the k vectors most
    cosine-similar to the label centroid (embedding-cosine near-dup primitive
    done group-wise — a window top-k over a broadcast-joined centroid dim)."""
    dim_size = F.size(F.col(vec_col))
    # centroid per label: elementwise mean via posexplode + groupBy
    exploded = df.select(
        F.col(label_col), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    centroids = (
        exploded.groupBy(label_col, "pos")
        .agg(F.avg("v").alias("c"))
        .groupBy(label_col)
        .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
        .select(
            F.col(label_col),
            F.transform("pc", lambda s: s["c"]).alias("centroid"),
        )
    )
    joined = df.join(F.broadcast(centroids), label_col)
    scored = joined.select(
        F.col(label_col),
        F.col(id_col),
        F.round(cosine(F.col(vec_col), F.col("centroid")), 4).alias("cos_sim"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy(label_col).orderBy(F.desc("cos_sim"), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
