"""Corpus analytics: PMI/LLR collocations, phrase search, TextRank,
readability. The driver oracles gate the fixture corpus; these pin hand
cases and independent python replays."""

import math

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.collocations import (
    collocation_scores,
    cooccurrence_edges,
    textrank_keywords,
)
from bloomine_spark.operators.retrieval import phrase_search
from bloomine_spark.operators.textops import readability_per_source


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


# --------------------------------------------------------------------------
# collocations
# --------------------------------------------------------------------------


def _llr_py(c12, c1, c2, n):
    def term(k, row, col):
        return k * math.log(k * n / (row * col)) if k > 0 else 0.0

    return 2.0 * (
        term(c12, c1, c2)
        + term(c1 - c12, c1, n - c2)
        + term(c2 - c12, n - c1, c2)
        + term(n - c1 - c2 + c12, n - c1, n - c2)
    )


def test_collocation_scores_match_python_replay(spark):
    texts = ["a b a b c d", "b c b c a d", "a b c d a b"]
    out = {
        (r["w1"], r["w2"]): r
        for r in collocation_scores(
            _docs(spark, texts), min_count=1, top_k=100
        ).collect()
    }
    # independent replay: adjacent pairs per doc
    from collections import Counter

    big = Counter()
    for t in texts:
        ws = t.split()
        for i in range(len(ws) - 1):
            big[(ws[i], ws[i + 1])] += 1
    n = sum(big.values())
    c1 = Counter()
    c2 = Counter()
    for (a, b), c in big.items():
        c1[a] += c
        c2[b] += c
    assert set(out) == set(big)
    for (a, b), c in big.items():
        r = out[(a, b)]
        assert r["c12"] == c and r["c1"] == c1[a] and r["c2"] == c2[b]
        assert r["pmi"] == pytest.approx(
            math.log(c * n / (c1[a] * c2[b])), rel=1e-12
        )
        assert r["llr"] == pytest.approx(
            _llr_py(c, c1[a], c2[b], n), rel=1e-10, abs=1e-12
        )


def test_collocation_min_count_and_topk(spark):
    texts = ["x y x y x y", "p q"]
    rows = collocation_scores(_docs(spark, texts), min_count=2, top_k=1).collect()
    assert len(rows) == 1
    assert (rows[0]["w1"], rows[0]["w2"]) in {("x", "y"), ("y", "x")}
    assert rows[0]["rank"] == 1


# --------------------------------------------------------------------------
# phrase search
# --------------------------------------------------------------------------


def _search(spark, texts, phrases):
    return {
        (r["phrase"], r["doc_id"]): (r["n_occurrences"], r["first_pos"])
        for r in phrase_search(_docs(spark, texts), phrases).collect()
    }


def test_phrase_search_basic_and_positions(spark):
    got = _search(
        spark,
        ["the quick fox jumps", "quick fox quick fox", "no match here"],
        ["quick fox"],
    )
    assert got == {("quick fox", 0): (1, 1), ("quick fox", 1): (2, 0)}


def test_phrase_search_repeated_word_phrase(spark):
    # 'a b a' in 'a b a b a': occurrences at 0 and 2 (overlapping)
    got = _search(spark, ["a b a b a"], ["a b a"])
    assert got == {("a b a", 0): (2, 0)}


def test_phrase_search_overlapping_unigram_run(spark):
    got = _search(spark, ["a a a a"], ["a a"])
    assert got == {("a a", 0): (3, 0)}


def test_phrase_search_boundaries(spark):
    # phrase at exact doc start and exact doc end; never wraps documents
    got = _search(spark, ["x y z", "z x y"], ["x y"])
    assert got == {("x y", 0): (1, 0), ("x y", 1): (1, 1)}
    # partial suffix at doc end is not a match
    assert _search(spark, ["p q"], ["q r"]) == {}


def test_phrase_search_validation(spark):
    d = _docs(spark, ["a b"])
    with pytest.raises(ValueError):
        phrase_search(d, [])
    with pytest.raises(ValueError):
        phrase_search(d, ["a  b"])  # empty word from double space


# --------------------------------------------------------------------------
# textrank
# --------------------------------------------------------------------------


def test_cooccurrence_edges_window(spark):
    edges = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(_docs(spark, ["a b c d"]), window=2).collect()
    }
    want_undirected = {("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"), ("b", "d")}
    want = want_undirected | {(b, a) for a, b in want_undirected}
    assert edges == want


def test_cooccurrence_no_self_loops_or_cross_doc(spark):
    edges = {
        (r["src"], r["dst"])
        for r in cooccurrence_edges(
            _docs(spark, ["a a b", "c d"]), window=1
        ).collect()
    }
    assert ("a", "a") not in edges
    assert ("b", "c") not in edges and ("c", "b") not in edges
    assert ("c", "d") in edges and ("a", "b") in edges


def test_textrank_hub_word_ranks_first(spark):
    # star corpus: 'hub' co-occurs with every spoke, spokes only with hub
    texts = [f"hub s{i}" for i in range(8)]
    rows = textrank_keywords(
        _docs(spark, texts), window=1, iterations=8, top_k=3
    ).collect()
    assert rows[0]["node"] == "hub" and rows[0]["rank"] == 1
    assert rows[0]["pr"] > rows[1]["pr"]


# --------------------------------------------------------------------------
# readability
# --------------------------------------------------------------------------


def _read_one(spark, text):
    df = spark.createDataFrame([("s", text)], ["source", "text"])
    [r] = readability_per_source(df).collect()
    return r


def test_readability_hand_counts(spark):
    # "see the cat. it sat!" -> 5 words, 2 sentences,
    # syllables: see(1) the(1) cat.(1) it(1) sat!(1) = 5
    r = _read_one(spark, "see the cat. it sat!")
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (5, 2, 5)
    wps, spw = 5 / 2, 5 / 5
    assert r["flesch_reading_ease"] == pytest.approx(
        206.835 - 1.015 * wps - 84.6 * spw, rel=1e-12
    )
    assert r["fk_grade"] == pytest.approx(
        0.39 * wps + 11.8 * spw - 15.59, rel=1e-12
    )


def test_readability_zero_vowel_word_and_no_terminator(spark):
    # 'xyz' has no vowel -> counts 1 syllable; no terminators -> 1 sentence
    r = _read_one(spark, "xyz qrst banana")
    assert r["n_sentences"] == 1
    # banana = 3 vowel groups, xyz/qrst = 1 each (zero-vowel correction)
    assert r["n_syllables"] == 5


def test_readability_vowel_groups_not_letters(spark):
    # 'queue' -> groups 'ueue'? u-e-u-e contiguous: 'ueue' is ONE group
    r = _read_one(spark, "queue")
    assert r["n_syllables"] == 1
    # 'aeiou' one group; 'oasis' -> oa, i -> wait: o-a contiguous, s, i, s
    r2 = _read_one(spark, "oasis")
    assert r2["n_syllables"] == 2
