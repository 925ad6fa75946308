"""Table profiling + exact equal-frequency binning."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.profiling import (
    assign_bins,
    equal_freq_bins,
    profile_table,
)


def _df(spark):
    rows = [
        {"x": 1.0, "s": "a"},
        {"x": 2.0, "s": "a"},
        {"x": None, "s": "b"},
        {"x": 4.0, "s": None},
        {"x": 4.0, "s": "c"},
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows).astype({"x": "float64"})
    )


def test_profile_metrics(spark):
    out = {
        (r["column_name"], r["metric"]): r["value"]
        for r in profile_table(_df(spark)).collect()
    }
    assert out[("x", "n")] == 4.0
    assert out[("x", "null_frac")] == pytest.approx(0.2)
    assert out[("x", "n_distinct")] == 3.0     # nulls don't count
    assert out[("x", "min")] == 1.0
    assert out[("x", "max")] == 4.0
    assert out[("x", "mean")] == pytest.approx(2.75)
    assert out[("s", "n")] == 4.0
    assert out[("s", "n_distinct")] == 3.0
    # string columns carry no numeric-moment rows
    assert ("s", "mean") not in out and ("s", "min") not in out


def test_profile_single_pass_plan(spark):
    # the whole profile is ONE aggregate: exactly one scan of the input
    plan = (
        profile_table(_df(spark), ["x"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("LogicalRDD") <= 1


def test_equal_freq_bins_exact_ranks(spark):
    vals = list(range(1, 13))  # 1..12, n=12, 4 bins -> ranks 3,6,9
    df = spark.createDataFrame(pd.DataFrame({"v": [float(x) for x in vals]}))
    assert equal_freq_bins(df, "v", 4) == [3.0, 6.0, 9.0]
    # n not divisible: n=10, 3 bins -> ceil(10/3)=4, ceil(20/3)=7
    df10 = spark.createDataFrame(
        pd.DataFrame({"v": [float(x) for x in range(1, 11)]})
    )
    assert equal_freq_bins(df10, "v", 3) == [4.0, 7.0]


def test_assign_bins_boundaries_and_nulls(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"v": [0.5, 3.0, 3.5, 9.0, 9.5, None]})
    )
    out = {
        (r["v"] if r["v"] is not None else None): r["bin"]
        for r in assign_bins(df, "v", [3.0, 9.0]).collect()
    }
    assert out[0.5] == 0
    assert out[3.0] == 0      # boundary belongs to the lower bin (<=)
    assert out[3.5] == 1
    assert out[9.0] == 1
    assert out[9.5] == 2
    assert out[None] == -1


def test_assign_bins_zero_exchange_plan(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [1.0, 2.0]}))
    plan = (
        assign_bins(df, "v", [1.5])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    ).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_bins_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"v": [1.0]}))
    with pytest.raises(ValueError, match="n_bins"):
        equal_freq_bins(df, "v", 1)
    assert equal_freq_bins(df.filter("v > 99"), "v", 3) == []


def test_profile_hostile_column_names(spark):
    # review finding: quotes/backticks in a column name must not break
    # the unpivot (positional rename — names never enter identifiers)
    df = spark.createDataFrame(
        pd.DataFrame([{"it's`odd": 1.0, "with.dot": "x"}])
    )
    out = {r["column_name"] for r in profile_table(df).collect()}
    assert out == {"it's`odd", "with.dot"}
