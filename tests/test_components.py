"""Connected-components duplicate clustering: min-label propagation over a
verified pair graph — chains (diameter > 1), multiple clusters, singletons,
and agreement with the greedy dedup policy on clique graphs."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.components import (
    connected_components,
    duplicate_clusters,
)


def _pairs(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id_a", "id_b"]))


def test_chain_collapses_to_min_id(spark):
    # 1-2, 2-3, 3-4: diameter 3 — label must propagate across hops
    p = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {r["node"]: r["component"] for r in connected_components(p).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_duplicate_clusters_sizes_and_singletons(spark):
    docs = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3, 4, 10, 11, 99]}))
    p = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in duplicate_clusters(docs, p).collect()
    }
    assert got[1] == (1, 4) and got[4] == (1, 4)
    assert got[10] == (10, 2) and got[11] == (10, 2)
    assert got[99] == (99, 1)  # singleton keeps itself


def test_representatives_match_greedy_dedup_on_cliques(spark):
    """On clique-shaped pair graphs (what verified exact/near-dup clusters
    look like), keep-cluster-representative == dedup_near's greedy
    keep-lowest-id survivors."""
    from invoice_extraction_spark.operators.dedup import dedup_near, ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),
        (2, base.replace("today", "tonight")),
        (3, "completely different words about tractors invoices and monsoon harvests"),
        (4, "short text"),
    ]
    d = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    pairs = ngram_jaccard_pairs(d, threshold=0.5)
    reps = {
        r["doc_id"]
        for r in duplicate_clusters(d, pairs)
        .filter(F.col("doc_id") == F.col("cluster_id"))
        .collect()
    }
    greedy = {r["doc_id"] for r in dedup_near(d, threshold=0.5).collect()}
    assert reps == greedy == {0, 3, 4}


def test_nonconvergence_raises(spark):
    p = _pairs(spark, [(1, 2), (2, 3), (3, 4)])
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(p, max_iter=1)


def test_partitioning_independence(spark):
    p = _pairs(spark, [(5, 9), (9, 2), (7, 8)])
    a = sorted(map(tuple, connected_components(p).collect()))
    b = sorted(map(tuple, connected_components(p.repartition(7)).collect()))
    assert a == b == [(2, 2), (5, 2), (7, 7), (8, 7), (9, 2)]
