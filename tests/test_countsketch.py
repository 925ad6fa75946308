"""Count-Sketch + AMS F2: error bounds vs exact on skewed data, merge
associativity under arbitrary partition groupings, serde round-trip, and
the Spark grouped aggregation path vs exact per-group F2."""

from __future__ import annotations

import numpy as np
import pytest

from bloomine_spark.sketch.countsketch import CountSketch


def _zipf(seed, n=120_000, a=1.4):
    rng = np.random.default_rng(seed)
    d = rng.zipf(a, n)
    return d[d < 100_000].astype(np.int64)


def _exact_f2(data):
    _, cnt = np.unique(data, return_counts=True)
    return int((cnt.astype(object) ** 2).sum()), cnt


def test_f2_within_ams_bound():
    # Per-row AMS variance ≤ 2·F2²/w (4-wise signs); median over d rows.
    # Gate at 6/√w relative error — generous vs theory, tight vs noise.
    for seed in range(5):
        data = _zipf(seed)
        f2, _ = _exact_f2(data)
        sk = CountSketch.empty(0.02, 1e-2)
        sk.update_values(data)
        rel = abs(sk.f2_estimate() - f2) / f2
        assert rel <= 6.0 / np.sqrt(sk.w), (seed, rel)


def test_point_estimates_within_eps_sqrt_f2():
    data = _zipf(42)
    f2, _ = _exact_f2(data)
    vals, cnt = np.unique(data, return_counts=True)
    eps = 0.02
    sk = CountSketch.empty(eps, 1e-2)
    sk.update_values(data)
    probe = vals[np.argsort(-cnt)[:200]]
    truth = np.sort(cnt)[::-1][:200]
    est = sk.estimate_values(probe)
    assert np.all(np.abs(est - truth) <= eps * np.sqrt(f2))


def test_point_estimates_unbiased_sign():
    # Unlike count-min, errors must go BOTH ways on dense data.
    data = _zipf(7)
    vals, cnt = np.unique(data, return_counts=True)
    sk = CountSketch.with_shape(5, 256)  # deliberately tiny → visible noise
    sk.update_values(data)
    err = sk.estimate_values(vals[:500]) - cnt[:500]
    assert (err > 0).any() and (err < 0).any()


def test_merge_associativity_counter_exact():
    data = _zipf(3)
    whole = CountSketch.empty(0.05, 1e-2)
    whole.update_values(data)
    for cuts in ([10], [7, 77, 7777], [1, 2, 3, len(data) - 5]):
        parts = np.array_split(data, cuts)
        acc = CountSketch.empty(0.05, 1e-2)
        for p in parts:
            s = CountSketch.empty(0.05, 1e-2)
            s.update_values(p)
            acc.merge(s)
        assert np.array_equal(acc.counts, whole.counts)
        assert acc.n == whole.n
        assert acc.f2_estimate() == whole.f2_estimate()


def test_serde_roundtrip():
    sk = CountSketch.empty(0.05, 1e-2)
    sk.update_values(_zipf(9))
    rt = CountSketch.from_bytes(sk.to_bytes())
    assert np.array_equal(rt.counts, sk.counts) and rt.n == sk.n
    with pytest.raises(ValueError):
        CountSketch.from_bytes(b"nope" + sk.to_bytes()[4:])


def test_shape_validation():
    with pytest.raises(ValueError):
        CountSketch.with_shape(3, 1000)  # not a power of two
    a = CountSketch.with_shape(3, 512)
    b = CountSketch.with_shape(3, 256)
    with pytest.raises(ValueError):
        a.merge(b)


def test_spark_grouped_f2_vs_exact(spark):
    from pyspark.sql import functions as F

    from bloomine_spark.sketch.core import estimates_df, sketch_agg

    rng = np.random.default_rng(5)
    rows = [
        (f"g{i % 3}", [int(x) for x in rng.zipf(1.3, 400) if x < 10_000])
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "g string, tokens array<long>").repartition(7)
    factory = lambda: CountSketch.empty(0.02, 1e-2)  # noqa: E731
    states = sketch_agg(df, ["g"], "tokens", factory)
    est = {
        r["g"]: r["estimate"]
        for r in estimates_df(
            states, factory, lambda s: s.f2_estimate()
        ).collect()
    }
    import collections

    exact = collections.Counter()
    f2 = {}
    for g, toks in rows:
        exact[g] = exact[g] if g in exact else collections.Counter()
        exact[g].update(toks)
    for g, c in exact.items():
        f2[g] = sum(v * v for v in c.values())
    for g in f2:
        assert abs(est[g] - f2[g]) / f2[g] <= 6.0 / np.sqrt(8192)
