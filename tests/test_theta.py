"""Theta (KMV) sketch: estimate accuracy, merge invariance, set algebra,
serde, and the distributed aggregation path."""

import numpy as np
import pytest

from bloomine_spark.sketch.theta import (
    ThetaSketch,
    theta_a_not_b,
    theta_intersect,
    theta_union,
)

K = 4096
TOL = 4 / np.sqrt(K)  # ~4 sigma


def _sk(values, k=K):
    s = ThetaSketch.empty(k)
    s.update_values(np.asarray(values, dtype=np.int64))
    return s


def test_exact_below_k():
    s = _sk(np.arange(1000))
    assert s.estimate() == 1000.0


def test_estimate_error_bound():
    n = 200_000
    s = _sk(np.arange(n))
    assert abs(s.estimate() - n) / n < TOL


def test_duplicates_ignored():
    s = _sk(np.tile(np.arange(5000), 40))  # 200k values, 5k distinct
    assert abs(s.estimate() - 5000) / 5000 < TOL


def test_merge_equals_single_pass():
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 300_000, 400_000)
    whole = _sk(vals)
    parts = [_sk(c) for c in np.array_split(vals, 7)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    # same retained set regardless of partitioning (state-identical)
    assert merged.theta == whole.theta
    np.testing.assert_array_equal(merged.samples, whole.samples)


def test_serde_roundtrip():
    s = _sk(np.arange(100_000))
    t = ThetaSketch.from_bytes(s.to_bytes())
    assert t.k == s.k and t.theta == s.theta
    np.testing.assert_array_equal(t.samples, s.samples)
    assert t.estimate() == s.estimate()


def test_set_algebra_accuracy():
    # A = [0, 150k), B = [100k, 250k): |A∪B|=250k, |A∩B|=50k, |A\B|=100k
    a = _sk(np.arange(0, 150_000))
    b = _sk(np.arange(100_000, 250_000))
    assert abs(theta_union(a, b).estimate() - 250_000) / 250_000 < TOL
    inter = theta_intersect(a, b).estimate()
    assert abs(inter - 50_000) / 50_000 < 3 * TOL  # intersection: fewer samples
    diff = theta_a_not_b(a, b).estimate()
    assert abs(diff - 100_000) / 100_000 < 2 * TOL


def test_disjoint_intersection_is_zero():
    a = _sk(np.arange(0, 50_000))
    b = _sk(np.arange(60_000, 110_000))
    assert theta_intersect(a, b).estimate() < 0.01 * 50_000


def test_spark_agg_and_grouping_invariance(spark):
    from pyspark.sql import functions as F

    from bloomine_spark.sketch.core import sketch_agg_global

    df = spark.range(0, 120_000).select(
        (F.col("id") % 30_000).alias("v")
    )
    sk4 = sketch_agg_global(df.repartition(4), "v", lambda: ThetaSketch.empty(K))
    sk16 = sketch_agg_global(df.repartition(16), "v", lambda: ThetaSketch.empty(K))
    # partition-grouping invariance: identical retained state
    assert sk4.theta == sk16.theta
    np.testing.assert_array_equal(sk4.samples, sk16.samples)
    assert abs(sk4.estimate() - 30_000) / 30_000 < TOL


def test_entry_theta_vs_exact_companion(spark):
    import os

    import pytest as _pytest

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        _pytest.skip("testdata absent")
    import __spark_entry__ as em

    exact = em.queries()["distinct_tokens_setops_exact"](spark, sf).head()
    est = {
        r["set_op"]: r["est"]
        for r in em.queries()["theta_tokens_setops"](spark, sf).collect()
    }
    for key in ("n_a", "n_b", "n_union", "n_intersect", "n_a_not_b"):
        want = exact[key]
        got = est[key]
        assert abs(got - want) <= max(4 / np.sqrt(K) * want, 2.0), (key, got, want)
