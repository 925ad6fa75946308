import numpy as np
import pytest

from bloomine_spark.functions.hashing import hash_u64
from bloomine_spark.params import ScreenParams
from bloomine_spark.sketch.bloom import BloomFilter, reference_sizing


def test_reference_sizing_quirks():
    # m = int(-(n ln p)/ln(2)^2), k = int((m // n) * ln 2) — integer division
    # quirk preserved (/root/reference/src/BloomFilter.hpp:66,80)
    m, k = reference_sizing(4, 1e-4)
    import math
    assert m == int(-(4 * math.log(1e-4)) / (math.log(2) ** 2))
    assert k == int((m // 4) * math.log(2))
    m1000, k1000 = reference_sizing(1000, 1e-4)
    assert m1000 == 19170  # floor of 19170.1...
    assert k1000 == 13     # floor(19 * 0.6931) = 13


def test_no_false_negatives():
    rng = np.random.default_rng(1)
    elems = hash_u64(rng.integers(0, 2**62, 5000))
    bf = BloomFilter.build(elems, 1e-4)
    assert bf.contains_hashes(elems).all()


def test_fpp_within_configured_bound():
    rng = np.random.default_rng(2)
    elems = hash_u64(rng.integers(0, 2**62, 10000))
    bf = BloomFilter.build(elems, 1e-3)
    probes = hash_u64(rng.integers(2**62, 2**63, 200000))
    fpp = bf.contains_hashes(probes).mean()
    # allow 3x headroom over the configured rate (sizing truncation)
    assert fpp <= 3e-3, fpp


def test_merge_is_union_and_associative():
    rng = np.random.default_rng(3)
    a = hash_u64(rng.integers(0, 2**62, 1000))
    b = hash_u64(rng.integers(0, 2**62, 1000))
    c = hash_u64(rng.integers(0, 2**62, 1000))
    total = np.concatenate([a, b, c])
    m, k = reference_sizing(3000, 1e-4)

    def bf_of(*parts):
        f = BloomFilter.empty(m, k)
        for p in parts:
            f.update_hashes(p)
        return f

    whole = bf_of(total)
    merged1 = bf_of(a).merge(bf_of(b)).merge(bf_of(c))
    merged2 = bf_of(a).merge(bf_of(b).merge(bf_of(c)))
    assert (whole.bits == merged1.bits).all()
    assert (merged1.bits == merged2.bits).all()
    assert whole.contains_hashes(total).all()


def test_merge_shape_mismatch_raises():
    with pytest.raises(ValueError):
        BloomFilter.empty(100, 3).merge(BloomFilter.empty(200, 3))


def test_serialization_roundtrip():
    rng = np.random.default_rng(4)
    elems = hash_u64(rng.integers(0, 2**62, 100))
    bf = BloomFilter.build(elems, 1e-4)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert (bf.bits == bf2.bits).all() and bf.m == bf2.m


def test_screen_params_thresholds():
    p = ScreenParams()
    # fixture: 4 unique k-grams → fp threshold = int(4*50/100) = 2
    assert p.fp_threshold(4) == 2
    assert p.fp_threshold(2) == 1
    # python-CLI variant fp_sim=35 → int(4*0.35)=1
    assert ScreenParams(fp_sim=35.0).fp_threshold(4) == 1
    # MST formula spot check (reference math, kslen=4):
    # obs_match=10, obs_error=2.5, obs_windows=0.4, H=40
    # mst = 40 - (0.4*15 + 7*(2.5*(0.4-1))) = 40 - (6 - 10.5) = 44.5
    assert p.mst(4) == pytest.approx(44.5)
    assert p.gap_threshold() == 8  # ceil((10*7-15)/7)


def test_tiny_filter_no_composite_m_fp_floor():
    """Regression: KM double hashing (h1 + i*h2) mod m cycles through
    m/gcd(h2,m) slots when m is composite — the reference-sized 2-element
    filter (m=86=2*43) gave ~1/43 of non-members a 2-bit probe walk and a
    ~1e-2 realized FP floor at ANY configured fpp. Per-round independent
    mixing must hold the realized rate at the configured 1e-9 (expected
    FPs over 200k probes: 0.0002)."""
    from bloomine_spark.functions.hashing import splitmix64

    targets = np.array([0x1234ABCD, 0x9876FEDC], dtype=np.uint64)
    bf = BloomFilter.build(targets, 1e-9)
    probes = splitmix64(np.arange(1, 200_001, dtype=np.uint64))
    probes = probes[~np.isin(probes, targets)]
    assert int(bf.contains_hashes(probes).sum()) == 0
    # and the members themselves always hit
    assert bf.contains_hashes(targets).all()
