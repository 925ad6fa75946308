"""Robust per-group stats: MAD modified-z outliers and winsorization —
python/numpy replay parity plus the degenerate-group conventions."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.robust import mad_outliers, winsorize


def _vdf(spark, groups):
    rows = [
        (g, i, float(v))
        for g, vals in groups.items()
        for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(rows, ["source", "doc_id", "v"])


def test_mad_outliers_replay(spark):
    vals = [10.0, 12.0, 11.0, 13.0, 9.0, 11.0, 400.0, 10.0]
    df = _vdf(spark, {"a": vals})
    out = {r["id"]: r for r in mad_outliers(df, "v").collect()}
    med = np.median(vals)
    mad = np.median(np.abs(np.array(vals) - med))
    for i, v in enumerate(vals):
        expect = 0.6745 * (v - med) / mad
        assert out[i]["med"] == med and out[i]["mad"] == mad
        assert out[i]["mz"] == pytest.approx(expect, abs=1e-12)
        assert out[i]["is_outlier"] == (abs(expect) > 3.5)
    assert sum(r["is_outlier"] for r in out.values()) == 1


def test_mad_outliers_degenerate_group(spark):
    # >half the values at the median -> MAD 0 -> NULL scores, no flags
    df = _vdf(spark, {"flat": [5.0, 5.0, 5.0, 5.0, 99.0]})
    rows = mad_outliers(df, "v").collect()
    assert all(r["mz"] is None for r in rows)
    assert not any(r["is_outlier"] for r in rows)


def test_mad_outliers_per_group_independent(spark):
    df = _vdf(spark, {"a": [1.0, 2.0, 3.0], "b": [100.0, 200.0, 300.0]})
    meds = {
        r["group"]: r["med"] for r in mad_outliers(df, "v").collect()
    }
    assert meds == {"a": 2.0, "b": 200.0}


def test_winsorize_matches_numpy(spark):
    vals = [float(v) for v in [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]]
    df = _vdf(spark, {"g": vals})
    out = winsorize(df, "v", "source", 0.1, 0.9).collect()
    lo = np.percentile(vals, 10)  # numpy default = linear interpolation
    hi = np.percentile(vals, 90)
    for r in out:
        assert r["p_lo"] == pytest.approx(lo, abs=1e-12)
        assert r["p_hi"] == pytest.approx(hi, abs=1e-12)
        assert r["v_w"] == pytest.approx(
            min(max(r["v"], lo), hi), abs=1e-12
        )


def test_winsorize_passthrough_and_validation(spark):
    df = _vdf(spark, {"g": [1.0, 2.0]})
    out = winsorize(df, "v")
    assert set(df.columns) <= set(out.columns)
    assert out.count() == 2
    with pytest.raises(ValueError):
        winsorize(df, "v", lower=0.9, upper=0.1)
