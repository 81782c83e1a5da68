"""Product quantization: encode parity vs an independent numpy twin,
deterministic fit, ADC recall against exact search, plan hygiene."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.pq import (
    fit_pq_codebooks,
    pq_adc_distance,
    pq_encode,
    pq_topk,
)

DIM, M, K = 64, 8, 16


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def books(spark, emb):
    return fit_pq_codebooks(emb, dim=DIM, m=M, k=K, seed=7)


def test_fit_deterministic_and_shaped(spark, emb, books):
    again = fit_pq_codebooks(emb, dim=DIM, m=M, k=K, seed=7)
    assert books == again
    assert len(books) == M and all(len(b) == K for b in books)
    assert all(len(c) == DIM // M for b in books for c in b)


def test_encode_matches_numpy_twin(spark, emb, books):
    """Column argmin == independent numpy argmin for every vector."""
    pdf = emb.select("vec_id", "embedding").toPandas()
    X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    d_sub = DIM // M
    want = {}
    for vid, x in zip(pdf["vec_id"], X):
        codes = []
        for mi in range(M):
            C = np.array(books[mi])
            d2 = ((x[mi * d_sub : (mi + 1) * d_sub] - C) ** 2).sum(axis=1)
            codes.append(int(d2.argmin()))
        want[vid] = codes
    got = {
        r["vec_id"]: list(r["c"])
        for r in emb.select("vec_id", pq_encode("embedding", books).alias("c")).collect()
    }
    assert got == want
    assert all(0 <= ci < K for cs in got.values() for ci in cs)


def test_adc_recall_vs_exact(spark, emb, books):
    """ADC over 4-bit codes must substantially agree with exact L2 top-10
    (64x compression keeps most of the neighborhood structure)."""
    q = [float(v) for v in emb.filter("vec_id = 0").collect()[0]["embedding"]]
    coded = emb.select("vec_id", pq_encode("embedding", books).alias("pq_codes"))
    approx = {r["vec_id"] for r in pq_topk(coded, q, books, k=10).collect()}

    diff = F.transform(
        F.sequence(F.lit(1), F.lit(DIM)),
        lambda i: (F.try_element_at(F.col("embedding"), i).cast("double") - F.try_element_at(F.lit(q), i)) ** 2,
    )
    exact = {
        r["vec_id"]
        for r in emb.select(
            "vec_id", F.aggregate(diff, F.lit(0.0), lambda a, x: a + x).alias("d")
        )
        .orderBy(F.asc("d"), F.asc("vec_id"))
        .limit(10)
        .collect()
    }
    recall = len(approx & exact) / 10
    assert 0 in approx  # the query vector itself is always found
    assert recall >= 0.3, recall  # far above chance (10/500 = 0.02)


def test_adc_distance_of_own_code_is_small(spark, emb, books):
    """A vector's ADC distance to its own codes equals the quantization
    error — far below the distance to a random other vector."""
    q = [float(v) for v in emb.filter("vec_id = 1").collect()[0]["embedding"]]
    coded = emb.select("vec_id", pq_encode("embedding", books).alias("pq_codes"))
    d = {
        r["vec_id"]: r["d"]
        for r in coded.filter("vec_id IN (1, 250)")
        .select("vec_id", F.round(pq_adc_distance("pq_codes", q, books), 6).alias("d"))
        .collect()
    }
    assert d[1] < d[250]


def test_pq_topk_is_map_only(spark, emb, books):
    q = [0.0] * DIM
    coded = emb.select("vec_id", pq_encode("embedding", books).alias("pq_codes"))
    plan = pq_topk(coded, q, books, k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan.split("TakeOrderedAndProject")[-1]  # no shuffle below top-k


def test_ivf_pq_index_and_search(spark, emb, books):
    """IVF-PQ: probing all cells reproduces the full PQ scan exactly;
    probing few cells prunes the scan yet keeps the query's own vector
    findable; the index is code-sized, not vector-sized."""
    from invoice_extraction_spark.operators.ivf_centroids import (
        FROZEN_IVF_CENTROIDS,
    )
    from invoice_extraction_spark.operators.pq import ivf_pq_index, ivf_pq_topk

    index = ivf_pq_index(emb, FROZEN_IVF_CENTROIDS, books).persist()
    assert set(index.columns) == {"vec_id", "cell", "pq_codes"}
    n_cells = index.select("cell").distinct().count()
    assert 2 <= n_cells <= 16

    q = [float(v) for v in emb.filter("vec_id = 7").collect()[0]["embedding"]]

    # n_probe = all cells == plain PQ full scan (same ids, same distances)
    full = ivf_pq_topk(index, q, FROZEN_IVF_CENTROIDS, books, k=10, n_probe=16)
    from invoice_extraction_spark.operators.pq import pq_topk

    plain = pq_topk(index, q, books, k=10)
    assert [r.asDict() for r in full.collect()] == [r.asDict() for r in plain.collect()]

    # narrow probe: the query's own vector lives in its nearest cell
    narrow = ivf_pq_topk(index, q, FROZEN_IVF_CENTROIDS, books, k=10, n_probe=2)
    ids = [r["vec_id"] for r in narrow.collect()]
    assert 7 in ids
    index.unpersist()


def test_frozen_codebooks_usable(spark, emb):
    """The frozen literal codebooks encode + search without any fit —
    the production deployment path."""
    from invoice_extraction_spark.operators.pq_codebooks import FROZEN_PQ_CODEBOOKS

    assert len(FROZEN_PQ_CODEBOOKS) == M
    assert all(len(b) == K for b in FROZEN_PQ_CODEBOOKS)
    coded = emb.select(
        "vec_id", pq_encode("embedding", FROZEN_PQ_CODEBOOKS).alias("pq_codes")
    )
    q = [float(v) for v in emb.filter("vec_id = 3").collect()[0]["embedding"]]
    top = [r["vec_id"] for r in pq_topk(coded, q, FROZEN_PQ_CODEBOOKS, k=5).collect()]
    assert 3 in top


def test_pq_topk_null_distances_sort_last(spark, books):
    """Malformed/short code arrays yield NULL ADC distance; ascending sort
    is NULLS FIRST in Spark, so without asc_nulls_last corrupt rows would
    head the top-k (ADVICE r3)."""
    m = len(books)
    good = [[i % 4 for _ in range(m)] for i in range(5)]
    rows = [(f"v{i}", c) for i, c in enumerate(good)] + [
        ("corrupt_short", [1]),       # too few codes -> try_element_at null
        ("corrupt_empty", []),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "pq_codes"])
    q = [0.1] * (m * len(books[0][0]))
    top = pq_topk(df, q, books, k=3).collect()
    assert all(r["adc_dist"] is not None for r in top)
    assert not any(r["vec_id"].startswith("corrupt") for r in top)
