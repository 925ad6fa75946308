"""Unigram-LM Viterbi segmentation (Kudo 2018): equality against an
independent Python DP replay (same tie-break contract), optimality vs
greedy WordPiece, unreachable-position handling."""

from __future__ import annotations

import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.bpe import (
    unigram_piece_vocab,
    unigram_segment_stats_per_source,
    unigram_viterbi_segment,
)


def _vocab(texts, max_len, min_count):
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    pc = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                pc[w[i : i + l]] += f
    kept = {p: c for p, c in pc.items() if c >= min_count or len(p) == 1}
    tot = sum(kept.values())
    return {p: math.log(c) - math.log(tot) for p, c in kept.items()}


def _viterbi(word, logp, max_len):
    """dp[i] = (round6, -np, pieces, score, np) maximized lexicographically
    — the engine's exact comparator."""
    dp = {0: (0.0, 0, "", 0.0, 0)}
    for i in range(1, len(word) + 1):
        best = None
        for j in range(max(0, i - max_len), i):
            if j not in dp:
                continue
            pc = word[j:i]
            if pc not in logp:
                continue
            _, _, pieces, score, np_ = dp[j]
            s = score + logp[pc]
            cand = (
                round(s, 6), -(np_ + 1),
                pieces + ("" if np_ == 0 else "|") + pc, s, np_ + 1,
            )
            if best is None or cand[:3] > best[:3]:
                best = cand
        if best is not None:
            dp[i] = best
    if len(word) not in dp:
        return None
    r, nn, pieces, score, np_ = dp[len(word)]
    return (score, np_, pieces)


def _run_segment(spark, words, vocab_rows, max_len):
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    vdf = spark.createDataFrame(
        vocab_rows, "piece string, logp double"
    )
    return {
        r["word"]: (r["score"], r["n_pieces"], r["pieces"])
        for r in unigram_viterbi_segment(wdf, vdf, max_len=max_len).collect()
    }


def test_matches_python_dp_random(spark):
    rng = random.Random(11)
    alpha = "abcd"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(30)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = unigram_piece_vocab(df, max_len=4, min_count=3)
    logp = {r["piece"]: r["logp"] for r in vocab.collect()}
    exp_logp = _vocab(texts, 4, 3)
    assert set(logp) == set(exp_logp)
    for p in logp:
        assert logp[p] == pytest.approx(exp_logp[p], abs=1e-9), p
    words = {w for t in texts for w in t.split(" ") if w}
    got = _run_segment(
        spark, words, [(p, lp) for p, lp in logp.items()], 4
    )
    for w in words:
        exp = _viterbi(w, exp_logp, 4)
        assert got[w][1:] == exp[1:], (w, got[w], exp)
        assert got[w][0] == pytest.approx(exp[0], abs=1e-9), w


def test_viterbi_beats_greedy_when_greedy_is_suboptimal(spark):
    # vocab: 'abc' is long but rare; 'ab' + 'cd' is jointly better than
    # 'abc' + 'd' -> greedy takes abc|d, Viterbi must pick ab|cd
    rows = [
        ("abc", math.log(0.01)), ("ab", math.log(0.3)),
        ("cd", math.log(0.3)), ("a", math.log(0.1)),
        ("b", math.log(0.1)), ("c", math.log(0.1)), ("d", math.log(0.01)),
    ]
    got = _run_segment(spark, ["abcd"], rows, 3)
    assert got["abcd"][2] == "ab|cd"
    assert got["abcd"][0] == pytest.approx(2 * math.log(0.3), abs=1e-9)


def test_unreachable_word_dropped(spark):
    # vocab lacks 'x': 'axa' has no path -> no output row
    rows = [("a", math.log(0.5))]
    got = _run_segment(spark, ["axa", "aa"], rows, 2)
    assert "axa" not in got
    assert got["aa"][2] == "a|a"


def test_stats_per_source(spark):
    df = spark.createDataFrame(
        [("s0", "abab cd"), ("s1", "abab abab")],
        "source string, text string",
    )
    out = {
        r["source"]: r
        for r in unigram_segment_stats_per_source(
            df, max_len=4, min_count=2
        ).collect()
    }
    logp = _vocab(["abab cd", "abab abab"], 4, 2)
    for src, text in (("s0", "abab cd"), ("s1", "abab abab")):
        words = [w for w in text.split(" ") if w]
        segs = [_viterbi(w, logp, 4) for w in words]
        np_ = sum(s[1] for s in segs)
        sc = sum(s[0] for s in segs)
        assert out[src]["n_words"] == len(words)
        assert out[src]["n_pieces"] == np_
        assert out[src]["fertility"] == pytest.approx(
            round(np_ / len(words), 6))
        assert out[src]["avg_logp"] == pytest.approx(
            round(sc / len(words), 6), abs=2e-6)
