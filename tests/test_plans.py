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
