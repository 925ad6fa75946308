"""Corpus-statistics operators: Zipf OLS fit (planted-slope recovery,
prune/head semantics) and pairwise source JSD (identity, disjoint-support
ln2 bound, python-reference replay)."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.textops import (
    source_jsd_pairs,
    zipf_fit_per_source,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, text string"
    )


def test_zipf_recovers_planted_slope(spark):
    # Frequencies f(r) = round(1000 / r^0.8) for 40 types -> slope ~ -0.8.
    toks = []
    for r in range(1, 41):
        toks += [f"w{r:02d}"] * max(2, round(1000 / r ** 0.8))
    random.Random(1).shuffle(toks)
    rows = [(f"d{i}", "s0", " ".join(toks[i::10])) for i in range(10)]
    out = zipf_fit_per_source(_df(spark, rows)).collect()[0]
    assert out["n_types_fit"] == 40
    assert out["slope"] == pytest.approx(-0.8, abs=0.05)


def test_zipf_prune_and_head(spark):
    # hapax (count 1) pruned by min_count=2; top_r caps the head.
    text = "a a a b b c"
    out = zipf_fit_per_source(
        _df(spark, [("d", "s", text)]), min_count=2
    ).collect()[0]
    assert out["n_types_fit"] == 2  # c is hapax
    capped = zipf_fit_per_source(
        _df(spark, [("d", "s", text)]), top_r=1, min_count=1
    ).collect()[0]
    assert capped["n_types_fit"] == 1
    assert capped["slope"] is None  # single point: no line, not a crash
    two = zipf_fit_per_source(
        _df(spark, [("d", "s", text)]), top_r=2, min_count=1
    ).collect()[0]
    assert two["n_types_fit"] == 2 and two["slope"] is not None


def _jsd_ref(ca: Counter, cb: Counter) -> float:
    ta, tb = sum(ca.values()), sum(cb.values())
    s = 0.0
    for t in set(ca) | set(cb):
        p, q = ca[t] / ta, cb[t] / tb
        m = (p + q) / 2
        if p:
            s += 0.5 * p * math.log(p / m)
        if q:
            s += 0.5 * q * math.log(q / m)
    return s


def test_jsd_matches_python_reference(spark):
    rng = random.Random(4)
    vocab = [f"t{i}" for i in range(15)]
    rows = []
    cnt = {}
    for s in ("sa", "sb", "sc"):
        toks = [rng.choice(vocab[: rng.randint(5, 15)]) for _ in range(300)]
        cnt[s] = Counter(toks)
        rows += [(f"{s}_{i}", s, " ".join(toks[i::5])) for i in range(5)]
    got = {
        (r["source_a"], r["source_b"]): r["jsd"]
        for r in source_jsd_pairs(_df(spark, rows)).collect()
    }
    assert len(got) == 3
    for (a, b), v in got.items():
        assert v == pytest.approx(_jsd_ref(cnt[a], cnt[b]), abs=1e-9)


def test_jsd_identical_sources_zero(spark):
    rows = [("a", "s1", "x y z x y"), ("b", "s2", "x y z x y")]
    out = source_jsd_pairs(_df(spark, rows)).collect()[0]
    assert out["jsd"] == pytest.approx(0.0, abs=1e-12)


def test_jsd_disjoint_sources_ln2(spark):
    # Disjoint vocabularies -> JSD = ln 2 exactly; no shared types means
    # the pair comes ONLY from the closed-form remainder... which needs
    # at least one shared type to materialize the pair row — a documented
    # consequence of the inner self-join. Add one vanishing shared token.
    rows = [("a", "s1", " ".join(["p"] * 200) + " zz"),
            ("b", "s2", " ".join(["q"] * 200) + " zz")]
    out = source_jsd_pairs(_df(spark, rows)).collect()[0]
    assert out["n_shared_types"] == 1
    assert out["jsd"] == pytest.approx(math.log(2), abs=0.01)
