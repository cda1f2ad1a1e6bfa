"""Binned range join: bounds, bin-edge crossing, equi keys, left
mode, parity with a naive BETWEEN join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_traj_spark.operators.rangejoin import overlap_count, range_join


@pytest.fixture(scope="module")
def data(spark):
    points = spark.createDataFrame(
        [(1, 5), (2, 10), (3, 27), (4, 99), (5, 30)],
        "pid long, p long",
    )
    intervals = spark.createDataFrame(
        [
            (100, 0, 10),   # contains 5, 10 (inclusive hi)
            (101, 10, 12),  # contains 10 (inclusive lo)
            (102, 25, 35),  # crosses the bin edge at 30 (width 10)
            (103, 90, 95),  # contains nothing
        ],
        "iid long, lo long, hi long",
    )
    return points, intervals


class TestRangeJoin:
    def test_inclusive_bounds_and_bin_edges(self, data):
        points, intervals = data
        out = range_join(points, intervals, "p", "lo", "hi", bin_width=10)
        got = {(r["pid"], r["iid"]) for r in out.collect()}
        assert got == {(1, 100), (2, 100), (2, 101), (3, 102), (5, 102)}

    def test_parity_with_naive_between(self, data):
        points, intervals = data
        binned = range_join(points, intervals, "p", "lo", "hi", bin_width=7)
        naive = points.join(
            intervals,
            (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi")),
        )
        a = {(r["pid"], r["iid"]) for r in binned.collect()}
        b = {(r["pid"], r["iid"]) for r in naive.collect()}
        assert a == b

    def test_left_keeps_unmatched_points(self, data):
        points, intervals = data
        out = range_join(points, intervals, "p", "lo", "hi", 10, how="left")
        pdf = out.toPandas()
        assert len(pdf[pdf["pid"] == 4]) == 1
        assert pdf[pdf["pid"] == 4]["iid"].isna().all()
        assert len(pdf) == 6  # 5 matches + 1 null-extended

    def test_equi_keys_restrict_matches(self, spark):
        points = spark.createDataFrame(
            [("a", 1, 5), ("b", 2, 5)], "k string, pid long, p long"
        )
        intervals = spark.createDataFrame(
            [("a", 10, 0, 9)], "k string, iid long, lo long, hi long"
        )
        out = range_join(
            points, intervals, "p", "lo", "hi", 4, equi_keys=["k"]
        )
        got = [(r["pid"], r["iid"]) for r in out.collect()]
        assert got == [(1, 10)]

    def test_overlap_count(self, data):
        points, intervals = data
        oc = overlap_count(
            points, intervals, "p", "lo", "hi", 10, group_cols=["pid"]
        ).toPandas().set_index("pid")["n_overlap"]
        assert oc.to_dict() == {1: 1, 2: 2, 3: 1, 5: 1}

    def test_plan_is_equi_join_not_nested_loop(self, data):
        points, intervals = data
        out = range_join(points, intervals, "p", "lo", "hi", bin_width=10)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan and "Cartesian" not in plan
