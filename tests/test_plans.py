"""Scale-hygiene plan assertions: pushdown, pruning, broadcast joins, shuffle
counts, zero row-wise Python (SURVEY.md §4; task brief "explain and iterate")."""

import __spark_entry__ as entrymod
from pyspark.sql import functions as F

from invoice_extraction_spark.corpus import pages_pdf
from invoice_extraction_spark.operators.extract import extract_pages
from invoice_extraction_spark.plans.explain import (
    count_exchanges,
    count_python_stages,
    has_broadcast_join,
    has_row_python_udf,
    pushed_filters,
    read_schema,
)

SF = "/root/testdata/sf0.001"


def test_filter_pushdown_reaches_parquet_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    pf = pushed_filters(q)
    assert "l_quantity" in pf and "GreaterThan" in pf, pf


def test_column_pruning_reaches_parquet_scan(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.select("l_orderkey", "l_quantity")
    rs = read_schema(q)
    assert "l_orderkey" in rs and "l_extendedprice" not in rs, rs


def test_revenue_query_uses_broadcast_joins(spark):
    q = entrymod.queries()["revenue_top_customers"](spark, SF)
    assert has_broadcast_join(q)
    assert not has_row_python_udf(q)


def test_extract_pipeline_single_python_stage_single_shuffle(spark):
    df = spark.createDataFrame(pages_pdf(8))
    out = extract_pages(df, num_partitions=4)
    # V2+V4+V5+V6 fused: exactly ONE Arrow Python stage
    assert count_python_stages(out) == 1
    # exactly ONE shuffle: the explicit salted repartition
    assert count_exchanges(out) == 1
    assert not has_row_python_udf(out)


def test_extract_pipeline_no_shuffle_when_unsalted(spark):
    df = spark.createDataFrame(pages_pdf(8))
    out = extract_pages(df)  # embarrassingly parallel: map-only plan
    assert count_exchanges(out) == 0


def test_no_query_uses_row_python_udfs(spark):
    for name, fn in entrymod.queries().items():
        q = fn(spark, SF)
        assert not has_row_python_udf(q), f"{name} has a row-wise Python UDF"


def test_embedding_pair_join_prunes_hot_buckets_with_broadcast(spark):
    """The hot-bucket gate must be a broadcast semi-join on the tiny
    (<= 2^n_planes rows) bucket-size frame — never a wide shuffle — and the
    final ranking must be TakeOrderedAndProject (top-k without a full sort)."""
    from invoice_extraction_spark.operators.similarity import embedding_topk_pairs

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = embedding_topk_pairs(e, k=5, n_planes=4, max_bucket_size=48)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:2000]
    assert "TakeOrderedAndProject" in plan
    assert not has_row_python_udf(q)


def test_incremental_dedup_never_scans_history_text(spark, tmp_path):
    """Candidate-level incremental dedup reads ONLY the persisted (band, id)
    index for history — never the history TEXT table (the property that
    makes daily-batch-vs-10^12-corpus dedup tractable). History lives in its
    own parquet dir here; the daily job's physical plan must scan the new
    batch only (the new batch legitimately appears twice: anti-join left
    side + its own band computation)."""
    import pandas as pd

    from invoice_extraction_spark.operators.dedup import band_index, dedup_incremental

    d = spark.read.parquet(f"{SF}/documents.parquet")
    hist_dir = str(tmp_path / "history_corpus")
    d.filter("doc_id < 20").write.parquet(hist_dir)
    # indexing job (reads history ONCE, persists tiny (band, id) rows)
    bands = band_index(spark.read.parquet(hist_dir)).collect()
    idx_df = spark.createDataFrame(
        pd.DataFrame(
            {"id": [r["id"] for r in bands], "band": [r["band"] for r in bands]}
        )
    )
    # daily dedup job: must not touch hist_dir
    out = dedup_incremental(d.filter("doc_id >= 20"), idx_df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "history_corpus" not in plan, plan[:2000]
    assert "documents.parquet" in plan
