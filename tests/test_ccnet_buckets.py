"""CCNet head/middle/tail perplexity buckets: python replay of the
add-k per-doc NLL + portable rank cut, balanced bucket sizes, and the
head-has-lowest-perplexity ordering."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.textops import ccnet_ppl_buckets


def _doc_nll(rows, k=0.5):
    docs = {d: [x for x in t.split(" ") if x] for d, _, t in rows}
    bf = Counter()
    for w in docs.values():
        bf.update(zip(w, w[1:]))
    cw = Counter()
    for (w1, _), c in bf.items():
        cw[w1] += c
    v = len({t for w in docs.values() for t in w})
    out = {}
    for d, s, _ in rows:
        w = docs[d]
        if len(w) < 2:
            continue
        lps = [
            math.log(bf[(a, b)] + k) - math.log(cw[a] + k * v)
            for a, b in zip(w, w[1:])
        ]
        out[d] = (s, -sum(lps) / len(lps))
    return out


def _ref_buckets(rows, n_buckets=3):
    nll = _doc_nll(rows)
    per_src = {}
    for d, (s, x) in nll.items():
        per_src.setdefault(s, []).append((round(x, 6), d, x))
    agg = {}
    for s, docs in per_src.items():
        docs.sort()
        n = len(docs)
        for rank, (_, d, x) in enumerate(docs):
            b = (n_buckets * rank) // n
            name = ["head", "middle", "tail"][b] if n_buckets == 3 else b
            agg.setdefault((s, name), []).append(x)
    return {
        key: (len(xs), sum(xs) / len(xs)) for key, xs in agg.items()
    }


def _df(spark, rows, parts=4):
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return df.select("source", "doc_id", "text").repartition(parts)


def test_matches_python_replay(spark):
    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(9)]
    rows = [
        (i, f"s{i % 3}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(60)
    ]
    ref = _ref_buckets(rows)
    got = {
        (r["source"], r["bucket"]): (r["n_docs"], r["mean_doc_nll"])
        for r in ccnet_ppl_buckets(_df(spark, rows)).collect()
    }
    assert set(got) == set(ref)
    for key in ref:
        assert got[key][0] == ref[key][0]
        assert got[key][1] == pytest.approx(ref[key][1], abs=1e-9)


def test_balanced_and_ordered(spark):
    # 9 scoreable docs in one source → exactly 3 per bucket, and the
    # head bucket's mean NLL must be the lowest, tail's the highest.
    rng = random.Random(23)
    vocab = [f"t{i}" for i in range(6)]
    rows = [
        (i, "s",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 30))))
        for i in range(9)
    ]
    got = {
        r["bucket"]: (r["n_docs"], r["mean_doc_nll"])
        for r in ccnet_ppl_buckets(_df(spark, rows)).collect()
    }
    assert {b: n for b, (n, _) in got.items()} == {
        "head": 3, "middle": 3, "tail": 3
    }
    assert got["head"][1] < got["middle"][1] < got["tail"][1]


def test_tiny_source_underfills_tail_first(spark):
    # 2 docs, 3 buckets: ranks 0,1 → buckets 0 and (3*1)//2 = 1 — head
    # and middle get one doc each, tail stays empty.
    rows = [(0, "s", "a b a b"), (1, "s", "a b c d")]
    got = {r["bucket"]: r["n_docs"]
           for r in ccnet_ppl_buckets(_df(spark, rows, parts=1)).collect()}
    assert got == {"head": 1, "middle": 1}
