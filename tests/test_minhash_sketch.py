"""MinHash signature sketch: jaccard/containment/distinct accuracy,
EXACT merge invariance (elementwise min), serde, the distributed
aggregation path, and the driver-query bound vs the exact companion."""

import numpy as np
import pytest

from bloomine_spark.sketch.minhash import MinHashSketch

K = 256
J_TOL = 4 * np.sqrt(0.25 / K)  # 4 sigma at the worst-case J=0.5


def _sk(values, k=K):
    s = MinHashSketch.empty(k)
    s.update_values(np.asarray(values, dtype=np.int64))
    return s


def test_jaccard_estimate_bound():
    # A = [0, 10k), B = [5k, 15k): J = 5k/15k = 1/3
    a = _sk(np.arange(0, 10_000))
    b = _sk(np.arange(5_000, 15_000))
    assert abs(a.jaccard(b) - 1 / 3) < J_TOL
    assert a.jaccard(a) == 1.0
    # disjoint sets: a 64-bit hash collision per slot is ~impossible
    c = _sk(np.arange(50_000, 60_000))
    assert a.jaccard(c) == 0.0


def test_distinct_estimate_bound():
    n = 100_000
    s = _sk(np.arange(n))
    assert abs(s.estimate() - n) / n < 4 / np.sqrt(K)
    assert MinHashSketch.empty(K).estimate() == 0.0
    # duplicates are free: multiset == set
    d = _sk(np.tile(np.arange(5_000), 30))
    assert abs(d.estimate() - 5_000) / 5_000 < 4 / np.sqrt(K)


def test_containment_subset():
    a = _sk(np.arange(0, 5_000))      # A ⊂ B
    b = _sk(np.arange(0, 20_000))
    assert a.containment(b) > 0.85    # true containment 1.0
    assert b.containment(a) < 0.4     # true 0.25


def test_merge_is_exact_elementwise_min():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1_000_000, 300_000)
    whole = _sk(vals)
    parts = [_sk(c) for c in np.array_split(vals, 9)]
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    # NOT just within error bounds: bit-identical signature
    np.testing.assert_array_equal(merged.sig, whole.sig)
    with pytest.raises(ValueError):
        whole.merge(MinHashSketch.empty(64))


def test_serde_roundtrip():
    s = _sk(np.arange(10_000))
    t = MinHashSketch.from_bytes(s.to_bytes())
    assert t.num_perm == s.num_perm
    np.testing.assert_array_equal(t.sig, s.sig)
    with pytest.raises(ValueError):
        MinHashSketch.from_bytes(b"XXXX" + s.to_bytes()[4:])


def test_spark_agg_grouping_invariance(spark):
    from pyspark.sql import functions as F

    from bloomine_spark.sketch.core import sketch_agg_global

    df = spark.range(0, 90_000).select((F.col("id") % 20_000).alias("v"))
    s4 = sketch_agg_global(
        df.repartition(4), "v", lambda: MinHashSketch.empty(K)
    )
    s16 = sketch_agg_global(
        df.repartition(16), "v", lambda: MinHashSketch.empty(K)
    )
    np.testing.assert_array_equal(s4.sig, s16.sig)  # grouping-invariant
    assert abs(s4.estimate() - 20_000) / 20_000 < 4 / np.sqrt(K)


def test_entry_minhash_vs_exact_companion(spark):
    import os

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("testdata absent")
    import __spark_entry__ as em

    exact = {
        (r["source_a"], r["source_b"]): r["jaccard"]
        for r in em.queries()["jaccard_sources_exact"](spark, sf).collect()
    }
    est = {
        (r["source_a"], r["source_b"]): r["est_jaccard"]
        for r in em.queries()["minhash_jaccard_sources"](spark, sf).collect()
    }
    assert set(est) == set(exact) and len(exact) == 6
    for pair, want in exact.items():
        tol = 4 * np.sqrt(max(want * (1 - want), 0.01) / K)
        assert abs(est[pair] - want) < tol, (pair, est[pair], want)


def test_minhash_vs_theta_jaccard_cross_estimator():
    """Two INDEPENDENT similarity estimators on the same sets: MinHash's
    matching-slot fraction vs J = |A∩B|/|A∪B| computed from theta-sketch
    set algebra. Both must sit near the true Jaccard within their combined
    error bounds — a cross-check neither can pass by construction."""
    from bloomine_spark.sketch.theta import (
        ThetaSketch,
        theta_intersect,
        theta_union,
    )

    a_vals = np.arange(0, 60_000)
    b_vals = np.arange(30_000, 90_000)       # J = 30k/90k = 1/3
    true_j = 1 / 3

    mh_a, mh_b = MinHashSketch.empty(256), MinHashSketch.empty(256)
    mh_a.update_values(a_vals)
    mh_b.update_values(b_vals)
    j_mh = mh_a.jaccard(mh_b)

    th_a, th_b = ThetaSketch.empty(4096), ThetaSketch.empty(4096)
    th_a.update_values(a_vals)
    th_b.update_values(b_vals)
    j_th = theta_intersect(th_a, th_b).estimate() / theta_union(
        th_a, th_b
    ).estimate()

    tol_mh = 4 * np.sqrt(true_j * (1 - true_j) / 256)
    tol_th = 8 / np.sqrt(4096)  # intersection+union errors compound
    assert abs(j_mh - true_j) < tol_mh, j_mh
    assert abs(j_th - true_j) < tol_th, j_th
    assert abs(j_mh - j_th) < tol_mh + tol_th
