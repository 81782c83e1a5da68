"""Hash-based sampling invariants: partitioning-independence (the whole
point vs RNG sampling), quota enforcement, split stability + proportions."""

import pandas as pd

from invoice_extraction_spark.operators.sampling import hash_quota_sample, hash_split

SF = "/root/testdata/sf0.001"


def test_quota_caps_every_stratum(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s = hash_quota_sample(d, "source", n_per_stratum=3)
    per = {r["source"]: r["n"] for r in s.groupBy("source").count().withColumnRenamed("count", "n").collect()}
    assert per and all(v <= 3 for v in per.values())


def test_sample_is_partitioning_independent(spark):
    """Identical membership regardless of how the input is partitioned —
    exactly what df.sample cannot promise."""
    d = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["doc_id"] for r in hash_quota_sample(d, "source", 5).select("doc_id").collect()}
    b = {
        r["doc_id"]
        for r in hash_quota_sample(d.repartition(17, "lang"), "source", 5)
        .select("doc_id")
        .collect()
    }
    assert a == b


def test_hash_split_stable_and_proportional(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    s1 = {r["doc_id"]: r["split"] for r in hash_split(d).select("doc_id", "split").collect()}
    s2 = {
        r["doc_id"]: r["split"]
        for r in hash_split(d.repartition(7)).select("doc_id", "split").collect()
    }
    assert s1 == s2  # membership is a pure function of the key
    n = len(s1)
    frac_val = sum(1 for v in s1.values() if v == "val") / n
    frac_test = sum(1 for v in s1.values() if v == "test") / n
    assert 0.05 <= frac_val <= 0.16 and 0.05 <= frac_test <= 0.16


def test_hash_split_is_map_only(spark):
    from invoice_extraction_spark.plans.explain import count_exchanges, has_row_python_udf

    d = spark.read.parquet(f"{SF}/documents.parquet")
    q = hash_split(d)
    assert count_exchanges(q) == 0
    assert not has_row_python_udf(q)


def test_seed_changes_sample(spark):
    d = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(200), "source": ["s"] * 200})
    )
    a = {r["doc_id"] for r in hash_quota_sample(d, "source", 50, seed=1).collect()}
    b = {r["doc_id"] for r in hash_quota_sample(d, "source", 50, seed=2).collect()}
    assert a != b  # different seeds draw different (deterministic) samples
