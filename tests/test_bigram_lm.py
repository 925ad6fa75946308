"""Bigram-LM perplexity triage: hand-replayed add-k model on a small
corpus, short-doc exclusion, and partition invariance."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.textops import bigram_logprob_per_source


def _ref(rows, k=0.5):
    docs = {
        d: [x for x in t.split(" ") if x] for d, _, t in rows
    }
    bf = Counter()
    for w in docs.values():
        bf.update(zip(w, w[1:]))
    cw = Counter()
    for (w1, _), c in bf.items():
        cw[w1] += c
    vocab = {t for w in docs.values() for t in w}
    v = len(vocab)
    src = {}
    for d, s, _ in rows:
        w = docs[d]
        if len(w) < 2:
            continue
        lps = [
            math.log(bf[(a, b)] + k) - math.log(cw[a] + k * v)
            for a, b in zip(w, w[1:])
        ]
        src.setdefault(s, []).append(-sum(lps) / len(lps))
    return {
        s: (len(nl), sum(nl) / len(nl), math.exp(sum(nl) / len(nl)))
        for s, nl in src.items()
    }


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    return df.select("source", "doc_id", "text").repartition(parts) \
        if parts > 1 else df.select("source", "doc_id", "text")


def test_matches_python_reference(spark):
    rng = random.Random(5)
    vocab = [f"t{i}" for i in range(8)]
    rows = [
        (f"d{i}", f"s{i % 3}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 18))))
        for i in range(40)
    ]
    ref = _ref(rows)
    got = {
        r["source"]: (r["n_docs"], r["mean_doc_nll"], r["ppl"])
        for r in bigram_logprob_per_source(_df(spark, rows)).collect()
    }
    assert set(got) == set(ref)
    for s in ref:
        assert got[s][0] == ref[s][0]
        assert got[s][1] == pytest.approx(ref[s][1], abs=1e-9)
        assert got[s][2] == pytest.approx(ref[s][2], rel=1e-9)


def test_short_docs_excluded(spark):
    rows = [
        ("a", "s", "x y x y"),
        ("b", "s", "solo"),
        ("c", "s", ""),
        ("d", "t", "x y"),
    ]
    got = {
        r["source"]: r["n_docs"]
        for r in bigram_logprob_per_source(_df(spark, rows)).collect()
    }
    assert got == {"s": 1, "t": 1}


def test_repetitive_doc_lower_nll(spark):
    # A doc made of the corpus's dominant bigram must score lower NLL
    # than a doc of rare bigrams.
    rows = (
        [(f"bg{i}", "bg", "a b a b a b a b") for i in range(6)]
        + [("probe_easy", "probe", "a b a b a b"),
           ("probe_hard", "probe", "q r s t u v")]
    )
    from bloomine_spark.operators.textops import bigram_logprob_per_source as f
    # score per source; probe source has both docs — compare via per-doc
    # by splitting probes into their own sources instead
    rows = (
        [(f"bg{i}", "bg", "a b a b a b a b") for i in range(6)]
        + [("pe", "easy", "a b a b a b"), ("ph", "hard", "q r s t u v")]
    )
    got = {r["source"]: r["mean_doc_nll"] for r in f(_df(spark, rows)).collect()}
    assert got["easy"] < got["hard"]


def test_partition_invariance(spark):
    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(10)]
    rows = [
        (f"d{i}", f"s{i % 4}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 25))))
        for i in range(50)
    ]
    def run(parts):
        return sorted(
            (r["source"], r["n_docs"], round(r["mean_doc_nll"], 9))
            for r in bigram_logprob_per_source(_df(spark, rows, parts)).collect()
        )
    assert run(1) == run(6)
