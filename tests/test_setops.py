"""Set operators (SURVEY.md §2.6): intersect / except are Spark built-ins;
pin their set-vs-multiset semantics so the coverage claim is tested."""

import pandas as pd


def _frames(spark):
    a = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 2, 3, 4]})
    )
    b = spark.createDataFrame(pd.DataFrame({"k": [2, 4, 5]}))
    return a, b


def test_intersect_is_set_semantics(spark):
    a, b = _frames(spark)
    assert sorted(r["k"] for r in a.intersect(b).collect()) == [2, 4]


def test_except_all_is_multiset_semantics(spark):
    a, b = _frames(spark)
    # one of the two 2s survives exceptAll; plain except drops both
    assert sorted(r["k"] for r in a.exceptAll(b).collect()) == [1, 2, 3]
    assert sorted(r["k"] for r in a.subtract(b).collect()) == [1, 3]
