"""Multi-probe sign-LSH candidate generation (similarity.candidate_memberships
/ embedding_topk_pairs(n_probe>0)): flip-lowest-|margin| probing for the
pair-generation self-join, off by default (the registered driver query and
its frozen DuckDB oracle stay on the single-bucket path).

Reference parity note: the reference has no ANN at all; this extends the
task brief's 'embedding-cosine near-dup' family along Lv et al. 2007
multi-probe LSH, adapted from query-time probing to pair generation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.similarity import (
    _hyperplanes,
    candidate_buckets,
    candidate_memberships,
    embedding_topk_pairs,
    lsh_bucket_expr,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_n_probe_zero_delegates_to_candidate_buckets(spark):
    emb = _emb(spark)
    m0 = candidate_memberships(emb, n_probe=0)
    b0 = candidate_buckets(emb)
    got = {(r["id"], r["bucket"]) for r in m0.collect()}
    want = {(r["id"], r["bucket"]) for r in b0.collect()}
    assert got == want
    assert m0.filter("not is_primary").count() == 0


def test_membership_counts_and_primary_parity(spark):
    emb = _emb(spark)
    n = emb.count()
    m = candidate_memberships(emb, n_probe=2, max_bucket_size=None)
    assert m.count() == 3 * n  # exactly (1+q) memberships per vector
    planes = _hyperplanes(64, 4, 7)
    ref = emb.select(
        F.col("vec_id").alias("id"),
        lsh_bucket_expr(F.col("embedding"), planes).alias("rb"),
    )
    mismatch = (
        m.filter("is_primary").join(ref, "id").filter("bucket != rb").count()
    )
    assert mismatch == 0  # primary key strings identical to the oracle form


def test_probes_flip_exactly_one_lowest_margin_bit(spark):
    emb = _emb(spark)
    m = candidate_memberships(emb, n_probe=1, max_bucket_size=None)
    rows = m.filter("id < 20").collect()
    planes = np.array(_hyperplanes(64, 4, 7))
    by_id = {}
    for r in rows:
        by_id.setdefault(r["id"], {})[r["is_primary"]] = r["bucket"]
    assert len(by_id) == 20
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in emb.filter("vec_id < 20").collect()
    }
    for vid, bks in by_id.items():
        prim, probe = bks[True], bks[False]
        diff = [i for i in range(4) if prim[i] != probe[i]]
        margins = planes @ vecs[vid]
        assert diff == [int(np.argmin(np.abs(margins)))]


def test_n_probe_validation(spark):
    emb = _emb(spark)
    with pytest.raises(ValueError):
        candidate_memberships(emb, n_probe=5)  # > n_planes
    with pytest.raises(ValueError):
        candidate_memberships(emb, n_probe=-1)


def _pair_set(df):
    return {(r["id_a"], r["id_b"]) for r in df.collect()}


def test_multiprobe_pairs_superset_and_no_dups(spark):
    emb = _emb(spark)
    big = 10**6  # k above any possible pair count at sf0.001 -> full sets
    p0 = embedding_topk_pairs(emb, k=big, max_bucket_size=None)
    p2 = embedding_topk_pairs(emb, k=big, max_bucket_size=None, n_probe=2)
    s0, rows2 = _pair_set(p0), p2.collect()
    s2 = {(r["id_a"], r["id_b"]) for r in rows2}
    assert s0 <= s2  # single-bucket pairs all survive
    assert len(rows2) == len(s2)  # dedup: no pair emitted twice
    assert all(a < b for a, b in s2)  # normalized ordering, no self-pairs


def test_boundary_pair_caught_only_by_multiprobe(spark):
    # craft a near-dup pair split by ONE near-zero margin: v1/v2 sit on
    # opposite sides of plane 0 (margins +-eps) and deep on the same side
    # of planes 1-3 -> different primary buckets, single-bucket LSH can
    # NEVER pair them; the flipped-lowest-margin probe must.
    planes = np.array(_hyperplanes(4, 4, 7))
    v1 = np.linalg.solve(planes, np.array([0.01, 5.0, 5.0, 5.0]))
    v2 = np.linalg.solve(planes, np.array([-0.01, 5.0, 5.0, 5.0]))
    df = spark.createDataFrame(
        [(1, [float(x) for x in v1]), (2, [float(x) for x in v2])],
        "vec_id long, embedding array<double>",
    )
    kw = dict(dim=4, max_bucket_size=None)
    assert _pair_set(embedding_topk_pairs(df, k=10, **kw)) == set()
    got = _pair_set(embedding_topk_pairs(df, k=10, n_probe=1, **kw))
    assert got == {(1, 2)}
    # and the recovered pair is a true near-dup (crafted cosine ~1)
    cos = np.dot(v1, v2) / (np.linalg.norm(v1) * np.linalg.norm(v2))
    assert cos > 0.99


def test_multiprobe_respects_hot_bucket_cap(spark):
    # identical vectors all probe the same flipped buckets; with a cap and
    # no refine the saturated buckets drop entirely -> no pair explosion
    rows = [(i, [1.0, 1.0, 1.0, 1.0]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = embedding_topk_pairs(
        df, k=10**6, dim=4, max_bucket_size=10, sub_bucket_planes=0, n_probe=2
    )
    assert out.count() == 0
