"""Connected-components duplicate clustering — the iterative job the greedy
single-pass dedup deliberately defers to (see ``dedup.dedup_near``:
"full connected components ... needs an iterative job").

Why it matters at corpus scale: greedy keep-lowest-id over verified pairs
drops a doc when ANY smaller-id near-dup exists, but it cannot name the
CLUSTER — and training-data pipelines want cluster ids (keep exactly one
representative per duplicate cluster, count cluster sizes, sample hard
negatives from within clusters). C4/RefinedWeb-style dedups run exactly this
step over the MinHash-verified pair graph.

Algorithm: hash-min label propagation (a.k.a. iterative min-id spreading) —
the standard Spark/GraphX-free formulation:

    label(v) <- min(label(v), min over neighbors u of label(u))

repeated until no label changes. Each iteration is ONE join of the current
(node, label) frame against the symmetrized edge list + ONE groupBy min —
both shuffles keyed on small ids, never document text. Converges in
O(diameter) iterations; duplicate clusters are near-cliques (diameter 1-2),
so 2-3 iterations close real corpora. Plans are checkpointed every iteration
via ``localCheckpoint`` to cut the lineage chain — without it the iterated
join plan grows exponentially and the driver OOMs planning iteration ~20
(the classic iterative-Spark trap).

At 10^12 docs: the pair graph after LSH+verify is SPARSE (only near-dup
edges), so the frames here are a tiny fraction of corpus size; the full
corpus never enters the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    max_iter: int = 20,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``; component =
    the minimum node id reachable through the pair graph (deterministic,
    partitioning-independent — oracle-checkable).

    Raises RuntimeError if ``max_iter`` passes don't converge (a real corpus
    pair graph converges in 2-4; hitting the cap means the input is not a
    near-dup graph and silently truncated labels would be wrong).
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # neighbor's current label flows along each directed edge copy
        candidate = (
            edges.join(labels.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), "component")
            .unionByName(labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        ).localCheckpoint(eager=True)
        changed = (
            candidate.join(
                labels.withColumnRenamed("component", "old"), "node"
            )
            .filter(F.col("component") != F.col("old"))
            .limit(1)
            .count()
        )
        labels = candidate
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} iterations")


def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Cluster ids over a verified near-dup pair graph: every doc gets a
    ``cluster_id`` (min doc id of its component; singletons = their own id)
    and ``cluster_size``. The keep-one-representative policy is then simply
    ``filter(col(id_col) == col("cluster_id"))`` — identical survivors to
    ``dedup_near`` on clique-shaped graphs, but with cluster lineage kept."""
    comp = connected_components(pairs).withColumnRenamed("node", id_col)
    labeled = df.select(id_col).join(comp, id_col, "left").select(
        F.col(id_col),
        F.coalesce("component", F.col(id_col)).alias("cluster_id"),
    )
    sizes = labeled.groupBy("cluster_id").agg(F.count("*").alias("cluster_size"))
    return labeled.join(sizes, "cluster_id").select(id_col, "cluster_id", "cluster_size")
