"""Embedding-LSH candidate-generation recall at sf1 (VERDICT r4 #1).

Ground truth comes from the sf1 corpus's construction (scripts/make_sf1.py):
every base vector has 9 seeded +-1% noisy copies at vec_id strides of
10,000, so same-origin pairs are KNOWN near-dups; we keep those whose true
cosine >= 0.99 as the truth set. A truth pair is RECALLED when both sides
share a final candidate bucket (``similarity.candidate_buckets`` — the
exact frame ``embedding_topk_pairs`` self-joins).

Configs compared:
  drop_r4      n_planes=4, cap, sub_bucket_planes=0  (the r4 default that
               measurably degraded at sf1: every coarse bucket saturates)
  refine_r5    n_planes=4, cap, sub_bucket_planes=4  (the round-5 default)
  auto_planes  n_planes=auto_n_planes(N), refine on  (the 100-TB config)

Usage: python scripts/measure_embedding_recall.py [sf_dir] [n_origins]
Prints one JSON line; paste the numbers into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from invoice_extraction_spark.operators import similarity as sim  # noqa: E402
from invoice_extraction_spark.session import get_spark  # noqa: E402

VEC_STRIDE = 10_000  # make_sf1.STRIDES["vec_id"]
COPIES = 10
MIN_COS = 0.99


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    n_origins = int(sys.argv[2]) if len(sys.argv) > 2 else 400
    spark = get_spark(
        app_name="emb-recall", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()

    # truth pairs: seeded sample of origins x 3 copy-pairs each
    rng = random.Random(11)
    n_base = n // COPIES
    origins = rng.sample(range(n_base), min(n_origins, n_base))
    pairs = []
    for o in origins:
        ks = rng.sample(range(COPIES), 6)
        for k1, k2 in zip(ks[::2], ks[1::2]):
            a, b = o + k1 * VEC_STRIDE, o + k2 * VEC_STRIDE
            pairs.append((min(a, b), max(a, b)))
    pdf = spark.createDataFrame(pairs, ["id_a", "id_b"])
    va = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("ea"))
    vb = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("eb"))
    truth = (
        pdf.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cos", sim.cosine(F.col("ea"), F.col("eb")))
        .filter(F.col("cos") >= MIN_COS)
        .select("id_a", "id_b")
        .persist()
    )
    n_truth = truth.count()

    configs = {
        "drop_r4": dict(n_planes=4, sub_bucket_planes=0),
        "refine_r5": dict(n_planes=4, sub_bucket_planes=4),
        "auto_planes": dict(
            n_planes=sim.auto_n_planes(n), sub_bucket_planes=4
        ),
        "refine_probe1": dict(n_planes=4, sub_bucket_planes=4, n_probe=1),
        "refine_probe2": dict(n_planes=4, sub_bucket_planes=4, n_probe=2),
        "auto_probe1": dict(
            n_planes=sim.auto_n_planes(n), sub_bucket_planes=4, n_probe=1
        ),
    }
    out = {"sf_dir": sf_dir, "n_vectors": n, "n_truth_pairs": n_truth,
           "min_cos": MIN_COS}
    for name, cfg in configs.items():
        t0 = time.time()
        # membership frame mirrors the pair join exactly: a truth pair is
        # recalled iff one side's PRIMARY bucket matches any membership of
        # the other (at n_probe=0 this is the plain shared-bucket check)
        mb = sim.candidate_memberships(emb, **cfg)
        prim = mb.filter("is_primary").select("id", "bucket")
        memb = mb.select("id", "bucket")
        def _hits(side_a, side_b):
            return (
                truth.join(side_a.withColumnRenamed("id", "id_a"), "id_a")
                .join(
                    side_b.withColumnRenamed("id", "id_b")
                    .withColumnRenamed("bucket", "bucket_b"),
                    "id_b",
                )
                .filter(F.col("bucket") == F.col("bucket_b"))
                .select("id_a", "id_b")
                .distinct()
            )
        hit = _hits(prim, memb).union(_hits(memb, prim)).distinct().count()
        out[name] = {
            **{k: v for k, v in cfg.items()},
            "recall": round(hit / n_truth, 4) if n_truth else None,
            "wall_s": round(time.time() - t0, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
