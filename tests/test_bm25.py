"""BM25 retrieval: scores vs a pure-python reference, per-source top-k
rank semantics, no-match exclusion, empty-query validation."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.retrieval import bm25_topk_per_source


def _ref_scores(rows, terms, k1=1.2, b=0.75):
    docs = {d: [x for x in t.split(" ") if x] for d, _, t in rows}
    n = len(docs)
    avgdl = sum(len(w) for w in docs.values()) / n
    df = Counter()
    for w in docs.values():
        for t in set(w) & set(terms):
            df[t] += 1
    out = {}
    for d, w in docs.items():
        tf = Counter(x for x in w if x in terms)
        if not tf:
            continue
        s = 0.0
        for t, f in tf.items():
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (f * (k1 + 1.0)) / (
                f + k1 * (1.0 - b + b * len(w) / avgdl)
            )
        out[d] = round(s, 6)
    return out


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, source string, text string"
    )


def test_scores_match_python_reference(spark):
    rng = random.Random(2)
    vocab = ["fast", "table", "scan", "x", "y", "z", "w"]
    rows = [
        (f"d{i}", f"s{i % 2}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 20))))
        for i in range(30)
    ]
    terms = ["fast", "table"]
    ref = _ref_scores(rows, terms)
    got = {
        r["doc_id"]: r["score"]
        for r in bm25_topk_per_source(_df(spark, rows), terms, k=100).collect()
    }
    assert set(got) == set(ref)
    for d in ref:
        assert got[d] == pytest.approx(ref[d], abs=2e-6)


def test_topk_and_ranks(spark):
    rows = [
        ("a", "s", "fast fast fast pad pad"),   # highest tf
        ("b", "s", "fast pad pad pad pad"),
        ("c", "s", "fast fast pad pad pad"),
        ("d", "s", "pad pad pad pad pad"),      # no match -> excluded
        ("e", "t", "fast pad"),
    ]
    out = bm25_topk_per_source(_df(spark, rows), ["fast"], k=2).collect()
    s = sorted([r for r in out if r["source"] == "s"], key=lambda r: r["rank"])
    assert [r["doc_id"] for r in s] == ["a", "c"]
    assert [r["rank"] for r in s] == [1, 2]
    assert {r["doc_id"] for r in out if r["source"] == "t"} == {"e"}
    assert all(r["doc_id"] != "d" for r in out)


def test_rarer_term_scores_higher(spark):
    # One doc matches the rare term, many match the common term; equal
    # tf and dl -> the rare-term doc must outrank.
    rows = (
        [(f"c{i}", "s", "common pad pad pad") for i in range(8)]
        + [("r0", "s", "rare pad pad pad")]
    )
    out = {r["doc_id"]: r["score"]
           for r in bm25_topk_per_source(
               _df(spark, rows), ["common", "rare"], k=20).collect()}
    assert out["r0"] > out["c0"]


def test_empty_query_rejected(spark):
    with pytest.raises(ValueError):
        bm25_topk_per_source(_df(spark, [("a", "s", "x")]), [])


def _ref_tfidf(rows, terms):
    """Independent lnc.ltc reference."""
    docs = {d: [x for x in t.split(" ") if x] for d, _, t in rows}
    n = len(docs)
    df = Counter()
    for w in docs.values():
        for t in set(w) & set(terms):
            df[t] += 1
    idf = {t: math.log(n / df[t]) for t in terms if df[t] > 0}
    qnorm = math.sqrt(sum(v * v for v in idf.values()))
    out = {}
    for d, w in docs.items():
        tf = Counter(w)
        dnorm = math.sqrt(
            sum((1 + math.log(f)) ** 2 for f in tf.values())
        )
        s = sum(
            (1 + math.log(tf[t])) / dnorm * idf[t] / qnorm
            for t in idf
            if tf[t] > 0
        )
        if s > 0:
            out[d] = round(s, 6)
    return out


def test_tfidf_cosine_matches_reference(spark):
    from bloomine_spark.operators.retrieval import (
        tfidf_cosine_topk_per_source,
    )

    rng = random.Random(5)
    vocab = ["fast", "table", "scan", "slow", "index", "row", "page"]
    rows = [
        (
            str(i),
            f"s{i % 2}",
            " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 30))),
        )
        for i in range(40)
    ]
    got = {
        r["doc_id"]: r["score"]
        for r in tfidf_cosine_topk_per_source(
            _df(spark, rows), ["fast", "table", "scan"], k=40
        ).collect()
    }
    want = _ref_tfidf(rows, ["fast", "table", "scan"])
    top = dict(
        sorted(want.items(), key=lambda kv: -kv[1])
    )
    for d, s in got.items():
        assert s == pytest.approx(top[d], abs=1e-6), d


def test_tfidf_cosine_properties(spark):
    from bloomine_spark.operators.retrieval import (
        tfidf_cosine_topk_per_source,
    )

    rows = [
        # doc 1 is ONLY query terms -> cosine 1-ish territory (max norm
        # alignment); doc 2 buries one query term in off-terms -> lower
        ("1", "s", "fast table scan"),
        ("2", "s", "fast row row row row row row row row"),
        ("3", "s", "row page index"),
        # absent query term must drop out, not error
    ]
    out = tfidf_cosine_topk_per_source(
        _df(spark, rows), ["fast", "table", "scan", "zzznone"], k=5
    ).collect()
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in out}
    assert set(got) == {"1", "2"}        # doc 3 shares no term
    assert got["1"][0] > got["2"][0]
    assert got["1"][1] == 1
    with pytest.raises(ValueError, match="distinct"):
        tfidf_cosine_topk_per_source(_df(spark, rows), ["a", "a"])
    with pytest.raises(ValueError, match="non-empty"):
        tfidf_cosine_topk_per_source(_df(spark, rows), [])


def test_tfidf_zero_signal_query_empty(spark):
    # review finding: every-term-everywhere query has qnorm 0 -> empty
    from bloomine_spark.operators.retrieval import (
        tfidf_cosine_topk_per_source,
    )

    rows = [("1", "s", "the cat"), ("2", "s", "the dog")]
    out = tfidf_cosine_topk_per_source(_df(spark, rows), ["the"], k=5)
    assert out.count() == 0
