"""Interpolated Kneser–Ney bigram LM: hand-replayed reference, the
normalization invariant (Σ_w2 P(w2|w1) == 1 over the bigram vocab), and
the continuation-probability ("San Francisco") property that separates
KN from add-k smoothing."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.textops import kneser_ney_ppl_per_source

D = 0.75


def _model(rows):
    docs = {d: [x for x in t.split(" ") if x] for d, _, t in rows}
    bf = Counter()
    for w in docs.values():
        bf.update(zip(w, w[1:]))
    cw, nf, nb = Counter(), Counter(), Counter()
    for (w1, w2), c in bf.items():
        cw[w1] += c
        nf[w1] += 1
        nb[w2] += 1
    bt = len(bf)

    def p(w1, w2):
        return (
            max(bf[(w1, w2)] - D, 0.0) / cw[w1]
            + D * nf[w1] / cw[w1] * nb[w2] / bt
        )

    return docs, bf, cw, nf, nb, bt, p


def _ref(rows):
    docs, bf, cw, nf, nb, bt, p = _model(rows)
    src = {}
    for d, s, _ in rows:
        w = docs[d]
        if len(w) < 2:
            continue
        lps = [math.log(p(a, b)) for a, b in zip(w, w[1:])]
        src.setdefault(s, []).append(-sum(lps) / len(lps))
    return {
        s: (len(nl), sum(nl) / len(nl), math.exp(sum(nl) / len(nl)))
        for s, nl in src.items()
    }


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    out = df.select("source", "doc_id", "text")
    return out.repartition(parts) if parts > 1 else out


def test_matches_python_reference(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(8)]
    rows = [
        (f"d{i}", f"s{i % 3}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(40)
    ]
    ref = _ref(rows)
    got = {
        r["source"]: (r["n_docs"], r["mean_doc_nll"], r["ppl"])
        for r in kneser_ney_ppl_per_source(_df(spark, rows)).collect()
    }
    assert set(got) == set(ref)
    for s in ref:
        assert got[s][0] == ref[s][0]
        assert got[s][1] == pytest.approx(ref[s][1], abs=1e-9)
        assert got[s][2] == pytest.approx(ref[s][2], rel=1e-9)


def test_distribution_normalizes():
    # For every context w1, P(·|w1) summed over the bigram w2-vocabulary
    # must be exactly 1: the discounted mass D·N1+(w1,·)/c(w1,·) is
    # redistributed through P_cont which itself sums to 1.
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(6)]
    rows = [
        (f"d{i}", "s",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 30))))
        for i in range(25)
    ]
    docs, bf, cw, nf, nb, bt, p = _model(rows)
    w2_vocab = {w2 for _, w2 in bf}
    for w1 in cw:
        assert sum(p(w1, w2) for w2 in w2_vocab) == pytest.approx(1.0, abs=1e-12)


def test_continuation_beats_raw_frequency(spark):
    # The KN signature: "francisco" occurs MANY times but always after
    # "san" (one context), while "thing" occurs the same number of times
    # after many different contexts. Add-k backs off by raw frequency and
    # scores them equally; KN's continuation probability must make an
    # unseen-context bigram ("new francisco") far less probable than
    # ("new thing").
    rows = [(f"sf{i}", "s", "san francisco") for i in range(8)] + [
        ("t0", "s", "one thing"), ("t1", "s", "another thing"),
        ("t2", "s", "some thing"), ("t3", "s", "every thing"),
        ("t4", "s", "any thing"), ("t5", "s", "no thing"),
        ("t6", "s", "that thing"), ("t7", "s", "this thing"),
        ("n0", "s", "new day new day"),
    ]
    docs, bf, cw, nf, nb, bt, p = _model(rows)
    assert sum(c for (a, b), c in bf.items() if b == "francisco") == sum(
        c for (a, b), c in bf.items() if b == "thing"
    )
    assert nb["thing"] == 8 and nb["francisco"] == 1
    assert p("new", "thing") > 5 * p("new", "francisco")
    # and the engine agrees with the replay on this corpus end-to-end
    ref = _ref(rows)
    got = {
        r["source"]: r["mean_doc_nll"]
        for r in kneser_ney_ppl_per_source(_df(spark, rows)).collect()
    }
    assert got["s"] == pytest.approx(ref["s"][1], abs=1e-9)


def test_short_docs_excluded_and_partition_invariance(spark):
    rows = [
        ("a", "s", "x y x y"), ("b", "s", "solo"), ("c", "s", ""),
        ("d", "t", "x y z w v u t s r q p"),
    ] + [
        (f"e{i}", "t", f"x y t{i} x")
        for i in range(12)
    ]
    def run(parts):
        return sorted(
            (r["source"], r["n_docs"], round(r["mean_doc_nll"], 9))
            for r in kneser_ney_ppl_per_source(_df(spark, rows, parts)).collect()
        )
    one = run(1)
    assert dict((s, n) for s, n, _ in one) == {"s": 1, "t": 13}
    assert one == run(7)
