"""Temporal operators: as-of join, windowed funnel, retention cohorts.

The driver oracles (DuckDB ASOF JOIN / CTE replays) gate the fixture
corpus; these tests pin the EDGE semantics the fixture can't reach —
equal-timestamp inclusivity, tolerance nulling, missed middle stages,
window boundaries — plus a pandas ``merge_asof`` replay on a random
event log (an independent third implementation of the same contract).
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.temporal import (
    asof_join,
    retention_cohorts,
    window_funnel,
)

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


# --------------------------------------------------------------------------
# asof_join
# --------------------------------------------------------------------------


def test_asof_basic_backward(spark):
    left = _mk(spark, [(1, _ts(10), "L1"), (1, _ts(30), "L2"),
                       (2, _ts(5), "L3")], ["k", "ts", "lv"])
    right = _mk(spark, [(1, _ts(8), "R1"), (1, _ts(20), "R2"),
                        (2, _ts(6), "R3")], ["k", "ts", "rv"])
    out = {r["lv"]: r["rv"] for r in
           asof_join(left, right, on="k").collect()}
    # L1 at t=10 -> latest right <= 10 is R1; L2 at 30 -> R2;
    # L3 at t=5 precedes every right row of key 2 -> null (left outer)
    assert out == {"L1": "R1", "L2": "R2", "L3": None}


def test_asof_equal_ts_inclusive(spark):
    left = _mk(spark, [(1, _ts(10), "L")], ["k", "ts", "lv"])
    right = _mk(spark, [(1, _ts(10), "R")], ["k", "ts", "rv"])
    [row] = asof_join(left, right, on="k").collect()
    assert row["rv"] == "R"  # right_ts == left_ts matches (DuckDB ASOF >=)


def test_asof_tolerance_nulls_stale(spark):
    left = _mk(spark, [(1, _ts(100), "L")], ["k", "ts", "lv"])
    right = _mk(spark, [(1, _ts(10), "R")], ["k", "ts", "rv"])
    # gap is 90 minutes: within a 2 h tolerance, beyond a 1 h one
    [row] = asof_join(left, right, on="k",
                      tolerance_us=120 * 60 * 1_000_000).collect()
    assert row["rv"] == "R"
    [row2] = asof_join(left, right, on="k",
                       tolerance_us=60 * 60 * 1_000_000).collect()
    assert row2["rv"] is None


def test_asof_name_collision_suffix(spark):
    left = _mk(spark, [(1, _ts(10), 1.0)], ["k", "ts", "value"])
    right = _mk(spark, [(1, _ts(5), 2.0)], ["k", "ts", "value"])
    cols = asof_join(left, right, on="k").columns
    assert cols == ["k", "ts", "value", "ts_right", "value_right"]


def test_asof_requires_payload(spark):
    df = _mk(spark, [(1, _ts(0))], ["k", "ts"])
    with pytest.raises(ValueError):
        asof_join(df, df.select("k"), on="k")


def test_asof_matches_pandas_merge_asof(spark):
    """Random event log vs pandas merge_asof — the independent third
    implementation (driver oracle is DuckDB ASOF JOIN)."""
    rng = np.random.default_rng(7)
    n_l, n_r = 400, 300
    lpdf = pd.DataFrame({
        "k": rng.integers(0, 12, n_l),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.choice(10**6, n_l, replace=False), unit="s"),
        "lid": np.arange(n_l),
    })
    rpdf = pd.DataFrame({
        "k": rng.integers(0, 12, n_r),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.choice(10**6, n_r, replace=False) + 500_000,
                          unit="s"),
        "rid": np.arange(n_r),
    })
    want = pd.merge_asof(
        lpdf.sort_values("ts"), rpdf.sort_values("ts"),
        on="ts", by="k", direction="backward",
    ).set_index("lid")["rid"]
    got = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), on="k"
    ).toPandas().set_index("lid")["rid"]
    assert len(got) == n_l
    for lid in range(n_l):
        g, w = got.loc[lid], want.loc[lid]
        assert (pd.isna(g) and pd.isna(w)) or g == w, (lid, g, w)


# --------------------------------------------------------------------------
# window_funnel
# --------------------------------------------------------------------------

FUNNEL_COLS = ["user_id", "ts", "event_type"]


def _funnel(spark, rows, **kw):
    ev = _mk(spark, rows, FUNNEL_COLS)
    return {
        r["user_id"]: (r["n_steps"], r["t1"], r["t2"], r["t3"])
        for r in window_funnel(
            ev, ["a", "b", "c"],
            window_us=kw.pop("window_us", 60 * 60 * 1_000_000), **kw
        ).collect()
    }


def test_funnel_full_and_partial(spark):
    out = _funnel(spark, [
        (1, _ts(0), "a"), (1, _ts(10), "b"), (1, _ts(20), "c"),
        (2, _ts(0), "a"), (2, _ts(10), "b"),
        (3, _ts(0), "a"),
        (4, _ts(0), "b"), (4, _ts(10), "c"),  # no step-1: absent entirely
    ])
    assert out[1][0] == 3 and out[2][0] == 2 and out[3][0] == 1
    assert 4 not in out


def test_funnel_strictly_after(spark):
    # b at the exact same timestamp as a does NOT count (strict >)
    out = _funnel(spark, [(1, _ts(0), "a"), (1, _ts(0), "b"),
                          (1, _ts(5), "c")])
    assert out[1][0] == 1


def test_funnel_window_anchors_at_step1(spark):
    # c is within 60 min of b but 70 min after the anchoring a -> misses
    out = _funnel(spark, [(1, _ts(0), "a"), (1, _ts(30), "b"),
                          (1, _ts(70), "c")])
    assert out[1][0] == 2
    # boundary: exactly window_us after t1 still counts (<=)
    out = _funnel(spark, [(1, _ts(0), "a"), (1, _ts(30), "b"),
                          (1, _ts(60), "c")])
    assert out[1][0] == 3


def test_funnel_missed_middle_blocks_late_stages(spark):
    # a ... c with no b: stage stops at 1 even though c exists
    out = _funnel(spark, [(1, _ts(0), "a"), (1, _ts(10), "c")])
    assert out[1] == (1, _ts(0), None, None)


def test_funnel_anchors_at_earliest_step1(spark):
    # the LATER a would complete the funnel, but greedy anchors at the
    # earliest a (documented ClickHouse-style semantics)
    out = _funnel(spark, [(1, _ts(0), "a"), (1, _ts(100), "a"),
                          (1, _ts(110), "b"), (1, _ts(120), "c")])
    assert out[1][0] == 1


def test_funnel_validates_steps(spark):
    ev = _mk(spark, [(1, _ts(0), "a")], FUNNEL_COLS)
    with pytest.raises(ValueError):
        window_funnel(ev, ["a"])


# --------------------------------------------------------------------------
# retention_cohorts
# --------------------------------------------------------------------------


def test_retention_hand_case(spark):
    ev = _mk(spark, [
        # user 1: first touch day 2 (week 0), active again day 16 (week 2)
        (1, T0 + dt.timedelta(days=2)),
        (1, T0 + dt.timedelta(days=16)),
        # user 2: first touch day 9 (week 1), active day 10 (offset 0) twice
        (2, T0 + dt.timedelta(days=9)),
        (2, T0 + dt.timedelta(days=10)),
    ], ["user_id", "ts"])
    got = {(r["cohort_week"], r["week_offset"]): (r["n_users"], r["n_events"])
           for r in retention_cohorts(ev).collect()}
    assert got == {(0, 0): (1, 1), (0, 2): (1, 1), (1, 0): (1, 2)}
