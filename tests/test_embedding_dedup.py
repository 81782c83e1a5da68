"""Embedding-cosine near-dup dedup gate (similarity.embedding_near_dup_pairs
/ embedding_dedup_survivors, jobs/curate.py --embedding-dedup): threshold
pair generation, components-based survivor selection (one per cluster even
on chained graphs), and the CLI wiring."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.similarity import (
    embedding_dedup_survivors,
    embedding_near_dup_pairs,
)


def _unit(v):
    v = np.asarray(v, dtype=float)
    return v / np.linalg.norm(v)


@pytest.fixture(scope="module")
def crafted(spark):
    """8 vectors in 3 clusters + 2 singletons, dim=8, seeded.

    cluster A: 0,1,2 (noisy copies)       -> survivor 0
    chain  B: 10~11, 11~12, 10!~12       -> survivor 10 (components, not greedy)
    singletons: 20, 21 (orthogonal-ish)  -> both survive
    """
    rng = np.random.default_rng(42)
    base_a = _unit(rng.normal(size=8))
    rows = [
        (0, base_a),
        (1, _unit(base_a + 0.005 * rng.normal(size=8))),
        (2, _unit(base_a + 0.005 * rng.normal(size=8))),
    ]
    # chain: walk two small steps in one direction so the ends drift apart
    step = _unit(rng.normal(size=8))
    b0 = _unit(rng.normal(size=8))
    b1 = _unit(b0 + 0.10 * step)
    b2 = _unit(b1 + 0.10 * step)
    rows += [(10, b0), (11, b1), (12, b2)]
    rows += [(20, _unit(rng.normal(size=8))), (21, _unit(rng.normal(size=8)))]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )
    cos = {
        (a, b): float(np.dot(dict(rows)[a], dict(rows)[b]))
        for a, b in [(0, 1), (0, 2), (1, 2), (10, 11), (11, 12), (10, 12)]
    }
    return emb, cos


def test_crafted_geometry_is_a_chain(crafted):
    _emb, cos = crafted
    assert min(cos[(0, 1)], cos[(0, 2)], cos[(1, 2)]) > 0.99
    assert cos[(10, 11)] > 0.99 and cos[(11, 12)] > 0.99
    assert cos[(10, 12)] < 0.99  # the ends are NOT near-dups of each other


def test_near_dup_pairs_threshold_and_determinism(spark, crafted):
    emb, _cos = crafted
    kw = dict(dim=8, max_bucket_size=None, n_probe=2)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, 0.99, **kw).collect()
    }
    assert {(0, 1), (0, 2), (1, 2), (10, 11), (11, 12)} <= pairs
    assert (10, 12) not in pairs  # threshold respected
    assert all(a < b for a, b in pairs)
    # repeat run identical (deterministic planes + rounding)
    again = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(emb, 0.99, **kw).collect()
    }
    assert pairs == again


def test_survivors_one_per_component_on_chains(spark, crafted):
    emb, _cos = crafted
    docs = emb.select(F.col("vec_id").alias("doc_id"), F.lit("t").alias("text"))
    out = embedding_dedup_survivors(
        docs, emb, min_cos=0.99, dim=8, max_bucket_size=None, n_probe=2
    )
    ids = {r["doc_id"] for r in out.collect()}
    # chain 10-11-12 collapses to ONE survivor (min id) even though
    # 10 and 12 are not near-dups of each other — greedy drop-id_b would
    # keep 10 only if 11's membership linked them; components guarantee it
    assert ids == {0, 10, 20, 21}


def test_curate_embedding_dedup_cli(spark, tmp_path, capsys):
    from jobs.curate import main

    emb_rows = spark.range(0, 30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: F.cos(F.col("id").cast("double") * i),
        ).alias("embedding"),
    )
    # make 25 a near-copy of 3: identical embedding -> cosine 1.0
    emb = emb_rows.filter("vec_id != 25").unionByName(
        emb_rows.filter("vec_id = 3").select(
            F.lit(25).cast("long").alias("vec_id"), "embedding"
        )
    )
    docs = spark.range(0, 30).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("document body text "), F.col("id")).alias("text"),
    )
    src = str(tmp_path / "docs.parquet")
    epath = str(tmp_path / "emb.parquet")
    tbl = str(tmp_path / "tbl")
    docs.write.parquet(src)
    emb.write.parquet(epath)
    main(
        [
            "--source", src,
            "--table", tbl,
            "--embedding-dedup", "0.999",
            "--embeddings", epath,
        ]
    )
    printed = capsys.readouterr().out
    assert "stage embedding_dedup:" in printed
    from invoice_extraction_spark.sources.atomic import read_table

    ids = {r["doc_id"] for r in read_table(spark, tbl).collect()}
    assert 3 in ids and 25 not in ids  # min-id canonical survived
    assert len(ids) == 29
