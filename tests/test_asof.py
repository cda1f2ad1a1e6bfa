"""As-of join operator: semantics, ties, tolerance, pandas parity,
plan shape (single exchange)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dask_traj_spark.operators.asof import asof_join, asof_join_pandas


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (1, 100, "a"),
            (1, 205, "b"),
            (1, 300, "c"),
            (2, 150, "d"),
            (3, 500, "e"),  # key with no right rows
        ],
        "k long, t long, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, 100, 10, 1.0),  # equal-ts: inclusive match for "a"
            (1, 200, 11, 2.0),
            (1, 200, 12, 3.0),  # tie on ts → max rid wins
            (2, 149, 20, 4.0),
            (2, 151, 21, 5.0),  # after "d": not matched
        ],
        "k long, t long, rid long, val double",
    )
    return left, right


def asof_pdf(out):
    return (
        out.orderBy("k", "t")
        .toPandas()
        .set_index("tag")
    )


class TestAsofJoin:
    def test_backward_inclusive_and_ties(self, sides):
        left, right = sides
        out = asof_join(
            left, right, "t", "t", "k", "k", payload=["rid", "val"], tie="rid"
        )
        pdf = asof_pdf(out)
        assert pdf.loc["a", "rid"] == 10  # equal ts matches (inclusive)
        assert pdf.loc["b", "rid"] == 12  # tie at t=200 → larger rid
        assert pdf.loc["c", "rid"] == 12
        assert pdf.loc["d", "rid"] == 20  # 151 is in the future
        assert pdf.loc["e", ["rid", "val"]].isna().all()  # no right rows

    def test_tolerance_nulls_stale_matches(self, sides):
        left, right = sides
        out = asof_join(
            left,
            right,
            "t",
            "t",
            "k",
            "k",
            payload=["rid"],
            tie="rid",
            tolerance=F.lit(50),
        )
        pdf = asof_pdf(out)
        assert pdf.loc["a", "rid"] == 10  # staleness 0
        assert pdf.loc["b", "rid"] == 12  # staleness 5
        assert pdf.loc["c"].isna()["rid"]  # staleness 100 > 50

    def test_pandas_variant_parity(self, sides):
        left, right = sides
        a = (
            asof_join(left, right, "t", "t", "k", "k", payload=["rid", "val"],
                      tie="rid")
            .orderBy("k", "t")
            .toPandas()
        )
        b = (
            asof_join_pandas(left, right, "t", "t", "k", "k",
                             payload=["rid", "val"])
            .orderBy("k", "t")
            .toPandas()
        )
        # merge_asof has no tie column; drop the tied row from the check
        a = a[a["tag"] != "b"].reset_index(drop=True)
        b = b[b["tag"] != "b"].reset_index(drop=True)
        assert a.columns.tolist() == b.columns.tolist()
        assert a.drop(columns=["val"]).equals(b.drop(columns=["val"]))

    def test_single_exchange_plan(self, sides):
        left, right = sides
        out = asof_join(left, right, "t", "t", "k", "k", payload=["rid"])
        plan = out._jdf.queryExecution().executedPlan().toString()
        # union + one window sort: exactly one shuffle exchange, no join
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
