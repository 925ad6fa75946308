"""Gopher rule-pack (Rae 2021) — per-rule flags vs a pure-Python
reference on engineered and fuzzed docs; integer cross-multiplication
semantics (no float thresholds)."""

from __future__ import annotations

import random
import re

from bloomine_spark.operators.textops import (
    GOPHER_STOPWORDS,
    gopher_quality,
    gopher_quality_per_source,
)


def ref_flags(text, min_words=50, max_words=100_000, min_mean=3,
              max_mean=10, min_stop=2):
    w = [x for x in text.split(" ") if x]
    nw = len(w)
    chars = sum(len(x) for x in w)
    sym = text.count("#") + (len(text) - len(text.replace("...", ""))) // 3
    alpha = sum(1 for x in w if re.search("[A-Za-z]", x))
    stop = len(set(w) & set(GOPHER_STOPWORDS))
    f = {
        "pass_word_count": min_words <= nw <= max_words,
        "pass_mean_word_len": min_mean * nw <= chars <= max_mean * nw,
        "pass_symbol_ratio": sym * 10 <= nw,
        "pass_alpha_words": alpha * 5 >= nw * 4,
        "pass_stop_words": stop >= min_stop,
    }
    f["keep"] = all(f.values())
    return f


FLAG_COLS = ["pass_word_count", "pass_mean_word_len", "pass_symbol_ratio",
             "pass_alpha_words", "pass_stop_words", "keep"]


def _check(spark, texts, **rules):
    docs = spark.createDataFrame(
        [(i, f"s{i % 2}", t) for i, t in enumerate(texts)],
        ["doc_id", "source", "text"],
    )
    got = {r["doc_id"]: r for r in gopher_quality(docs, **rules).collect()}
    for i, t in enumerate(texts):
        exp = ref_flags(t, **{
            {"min_words": "min_words", "max_words": "max_words",
             "min_mean_len": "min_mean", "max_mean_len": "max_mean",
             "min_stopwords": "min_stop"}[k]: v for k, v in rules.items()})
        for c in FLAG_COLS:
            assert got[i][c] == exp[c], (i, c, t)


def test_each_rule_binds(spark):
    good = "the quick brown fixture with that stream " * 8  # 64 words
    texts = [
        good,
        "the with short",                       # too few words
        ("a " * 60) + "the with",               # mean word len < 3
        good + " ###########",                  # symbol ratio > 0.1
        ("123 4567 " * 30) + "the with",        # alpha fraction < 0.8
        "table join scan filter " * 16,         # < 2 stopwords
        good + " ..." * 3,                      # ellipses counted, still ok
    ]
    _check(spark, texts, min_words=5, min_mean_len=3, max_mean_len=10,
           min_stopwords=2)
    # rule independence: exactly one rule fails for rows 1-5
    docs = spark.createDataFrame(
        [(i, "s0", t) for i, t in enumerate(texts)],
        ["doc_id", "source", "text"])
    rows = {r["doc_id"]: r
            for r in gopher_quality(docs, min_words=5).collect()}
    assert rows[0]["keep"] and rows[6]["keep"]
    for i in range(1, 6):
        assert not rows[i]["keep"]
        assert sum(not rows[i][c] for c in FLAG_COLS[:-1]) == 1, i


def test_fuzz_vs_reference(spark):
    rng = random.Random(68017)
    vocab = list(GOPHER_STOPWORDS) + ["x", "yz", "table", "12", "##",
                                      "...", "wordform", "q5"]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randint(0, 90)))
             for _ in range(120)]
    _check(spark, texts, min_words=10)


def test_per_source_report(spark):
    texts = ["the quick brown fixture with that stream " * 8,
             "too short the with"]
    docs = spark.createDataFrame(
        [(0, "sA", texts[0]), (1, "sA", texts[1]), (2, "sB", texts[0])],
        ["doc_id", "source", "text"])
    rep = {r["source"]: r
           for r in gopher_quality_per_source(docs).collect()}
    assert rep["sA"]["n_docs"] == 2 and rep["sA"]["n_kept"] == 1
    assert rep["sA"]["fail_word_count"] == 1
    assert rep["sB"]["n_kept"] == 1 and rep["sB"]["fail_stop_words"] == 0


def test_unigram_logprob(spark):
    """Hand-computable unigram NLL: freq a=3 b=2 c=1, N=6; determinism
    across partitionings."""
    import math
    from pyspark.sql import functions as F
    from bloomine_spark.operators.textops import unigram_logprob_per_source

    docs = spark.createDataFrame(
        [(1, "sA", "a a b"), (2, "sA", "a b c")],
        ["doc_id", "source", "text"])
    rows = unigram_logprob_per_source(docs).collect()
    assert len(rows) == 1 and rows[0]["n_docs"] == 2
    n = math.log(6)
    nll1 = n - (2 * math.log(3) + math.log(2)) / 3
    nll2 = n - (math.log(3) + math.log(2) + math.log(1)) / 3
    exp = (nll1 + nll2) / 2
    assert abs(rows[0]["mean_doc_nll"] - exp) < 1e-12
    assert abs(rows[0]["ppl"] - math.exp(exp)) < 1e-9

    # partition invariance within float tolerance
    d13 = spark.createDataFrame(
        [(i, f"s{i % 2}", t) for i, t in enumerate(
            ["a a b c", "b c d", "a d d e", "e a b"] * 6)],
        ["doc_id", "source", "text"])
    r1 = {r["source"]: r["mean_doc_nll"]
          for r in unigram_logprob_per_source(d13.repartition(1)).collect()}
    r2 = {r["source"]: r["mean_doc_nll"]
          for r in unigram_logprob_per_source(
              d13.repartition(16, F.col("doc_id"))).collect()}
    for s in r1:
        assert abs(r1[s] - r2[s]) < 1e-9
