"""Z-order layout: multi-column file skipping where single-column sorting
can only serve one column."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from invoice_extraction_spark.operators.zorder import z_value, zorder_layout
from invoice_extraction_spark.sources.atomic import commit_append, prune_report


@pytest.fixture(scope="module")
def grid(spark):
    # a 64x64 grid: x and y are independent — the adversarial case for
    # single-column layouts
    pdf = pd.DataFrame(
        [(i, i % 64, i // 64) for i in range(4096)], columns=["doc_id", "x", "y"]
    )
    return spark.createDataFrame(pdf)


def test_z_value_locality(spark, grid):
    """Nearby (x, y) cells get nearby z-values: the average z-distance of
    grid neighbors is far below that of random pairs."""
    zs = {
        (r["x"], r["y"]): r["_z"] for r in z_value(grid, ["x", "y"]).collect()
    }
    neighbor = [
        abs(zs[(x, y)] - zs[(x + 1, y)]) for x in range(0, 63, 7) for y in range(0, 64, 7)
    ]
    far = [
        abs(zs[(x, y)] - zs[(63 - x, 63 - y)]) for x in range(0, 30, 5) for y in range(0, 64, 9)
    ]
    assert sum(neighbor) / len(neighbor) < sum(far) / len(far) / 4


def test_zorder_skips_on_both_columns(spark, grid, tmp_path):
    """Committed z-ordered, BOTH x-filters and y-filters skip files; the
    x-sorted layout only ever skips on x."""
    ztbl, xtbl = str(tmp_path / "z"), str(tmp_path / "x")
    commit_append(
        zorder_layout(grid, ["x", "y"], n_files=16),
        ztbl,
        run_id="z1",
        ok_predicate="doc_id >= 0",
        stats_cols=["x", "y"],
    )
    commit_append(
        grid.repartitionByRange(16, "x").sortWithinPartitions("x"),
        xtbl,
        run_id="x1",
        ok_predicate="doc_id >= 0",
        stats_cols=["x", "y"],
    )
    zx = prune_report(ztbl, {"x": (0, 7)})
    zy = prune_report(ztbl, {"y": (0, 7)})
    assert zx["n_skipped"] > 0 and zy["n_skipped"] > 0  # skipping on BOTH axes

    xx = prune_report(xtbl, {"x": (0, 7)})
    xy = prune_report(xtbl, {"y": (0, 7)})
    assert xx["n_skipped"] >= zx["n_skipped"]  # single-column sort wins on x...
    assert xy["n_skipped"] == 0  # ...and is useless on y
    # z-order's whole point: combined skipping across both axes beats the
    # one-column layout's combined total
    assert zx["n_skipped"] + zy["n_skipped"] > xx["n_skipped"] + xy["n_skipped"] - zx["n_skipped"] // 2


def test_pruned_reads_stay_correct(spark, grid, tmp_path):
    from invoice_extraction_spark.sources.atomic import read_table

    tbl = str(tmp_path / "tbl")
    commit_append(
        zorder_layout(grid, ["x", "y"], n_files=16),
        tbl,
        run_id="z1",
        ok_predicate="doc_id >= 0",
        stats_cols=["x", "y"],
    )
    full = read_table(spark, tbl).filter("y BETWEEN 10 AND 12").count()
    pruned = (
        read_table(spark, tbl, prune={"y": (10, 12)})
        .filter("y BETWEEN 10 AND 12")
        .count()
    )
    assert pruned == full == 3 * 64
