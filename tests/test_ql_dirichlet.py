"""Dirichlet query-likelihood ranking (Zhai & Lafferty 2001): equality
against a naive full-vocabulary Python replay (no decomposition), plus
edge cases (repeated query terms, absent terms, unmatched docs ranked by
length)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from bloomine_spark.operators.retrieval import ql_dirichlet_topk_per_source

DOCS = [
    ("a", 0, "the cat sat on the mat"),
    ("a", 1, "the dog ate the cat food today ok fine sure"),
    ("a", 2, "completely unrelated words here"),
    ("a", 3, "cat cat cat"),
    ("b", 4, "mat mat on on"),
    ("b", 5, "the the the the the the the the"),
    ("b", 6, ""),
]


def _naive(docs, terms, mu):
    """Direct per-doc score over the FULL formula — every query term,
    matched or not, contributes ln((tf + mu*p_C)/(dl + mu))."""
    toks = {i: [w for w in t.split(" ") if w != ""] for _, i, t in docs}
    c_len = sum(len(v) for v in toks.values())
    ctf = Counter(w for v in toks.values() for w in v)
    kept = [t for t in terms if ctf[t] > 0]
    out = {}
    for src, i, _ in docs:
        dl = len(toks[i])
        tf = Counter(toks[i])
        s = sum(
            math.log((tf[t] + mu * ctf[t] / c_len) / (dl + mu))
            for t in kept
        )
        out[i] = (src, round(s, 6))
    return out


def _run(spark, terms, k=10, mu=50.0):
    df = spark.createDataFrame(
        DOCS, "source string, doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in ql_dirichlet_topk_per_source(
            df, terms, k=k, mu=mu
        ).collect()
    }


def test_matches_naive_full_formula(spark):
    for terms in (
        ["cat"],
        ["cat", "mat"],
        ["cat", "cat", "the"],        # repeated query term -> qtf=2
        ["cat", "nosuchword"],        # absent term dropped
        ["the", "on", "mat", "dog"],
    ):
        got = _run(spark, terms)
        exp = _naive(DOCS, terms, 50.0)
        assert set(got) == set(exp), terms
        for i, (src, s) in exp.items():
            assert got[i]["source"] == src
            assert got[i]["score"] == pytest.approx(s, abs=2e-6), (
                terms, i, got[i]["score"], s,
            )


def test_rank_order_and_k(spark):
    got = _run(spark, ["cat"], k=2)
    # source a: doc 3 (cat x3, dl=3) must outrank doc 0 (cat x1)
    a = {i: r for i, r in got.items() if r["source"] == "a"}
    assert len(a) == 2 and a[3]["rank"] == 1 and a[0]["rank"] == 2
    # source b has no 'cat' -> pure length penalty: shorter dl wins;
    # empty doc (dl=0) beats everything in b
    b = {i: r for i, r in got.items() if r["source"] == "b"}
    assert b[6]["rank"] == 1 and b[4]["rank"] == 2


def test_validation(spark):
    df = spark.createDataFrame(DOCS, "source string, doc_id long, text string")
    with pytest.raises(ValueError):
        ql_dirichlet_topk_per_source(df, [])
    with pytest.raises(ValueError):
        ql_dirichlet_topk_per_source(df, ["cat"], mu=0)
