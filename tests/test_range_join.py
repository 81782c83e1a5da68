"""Bucketed range join: exact agreement with a Python-twin nested loop,
no nested-loop join in the plan, loud refusal of degenerate intervals,
left-join semantics."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.range_join import interval_join


def _data():
    points = pd.DataFrame(
        {"pid": range(40), "p": [i * 2.5 for i in range(40)]}  # 0 .. 97.5
    )
    intervals = pd.DataFrame(
        {
            "iid": range(8),
            "s": [0, 10, 10, 35.0, 50, 80, 90, 99],
            "e": [9, 30, 12, 47.5, 50, 95, 91, 120],
        }
    )
    return points, intervals


def _expected(points, intervals):
    out = set()
    for _, pr in points.iterrows():
        for _, ir in intervals.iterrows():
            if ir["s"] <= pr["p"] <= ir["e"]:
                out.add((int(pr["pid"]), int(ir["iid"])))
    return out


@pytest.mark.parametrize("width", [1.0, 7.0, 25.0])
def test_matches_nested_loop_twin(spark, width):
    points, intervals = _data()
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(
            spark.createDataFrame(points),
            spark.createDataFrame(intervals),
            "p", "s", "e", bucket_width=width,
        ).collect()
    }
    assert got == _expected(points, intervals)


def test_no_nested_loop_in_plan(spark):
    points, intervals = _data()
    out = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        "p", "s", "e", bucket_width=10.0,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_left_join_keeps_unmatched_points(spark):
    points, intervals = _data()
    out = interval_join(
        spark.createDataFrame(points),
        spark.createDataFrame(intervals),
        "p", "s", "e", bucket_width=10.0, how="left",
    ).collect()
    expected = _expected(points, intervals)
    matched = {(r["pid"], r["iid"]) for r in out if r["iid"] is not None}
    assert matched == expected
    matched_pids = {p for p, _ in expected}
    null_pids = {r["pid"] for r in out if r["iid"] is None}
    assert null_pids == set(range(40)) - matched_pids
    # exactly one null row per unmatched point
    assert len(out) == len(expected) + len(null_pids)


def test_degenerate_interval_refused(spark):
    points, intervals = _data()
    wide = intervals.copy()
    wide.loc[0, "e"] = 1e9
    with pytest.raises(ValueError, match="buckets"):
        interval_join(
            spark.createDataFrame(points),
            spark.createDataFrame(wide),
            "p", "s", "e", bucket_width=0.5,
        )
