"""WordPiece greedy longest-match segmentation: replay equality against
an independent Python implementation, vocab force-keep of single chars,
fertility aggregation."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from bloomine_spark.operators.bpe import (
    wordpiece_fertility_per_source,
    wordpiece_segment,
    wordpiece_vocab,
)


def _vocab(texts, max_len, min_count):
    wf = Counter(w for t in texts for w in t.split(" ") if w)
    pc = Counter()
    for w, f in wf.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                pc[w[i : i + l]] += f
    return {p for p, c in pc.items() if c >= min_count or len(p) == 1}


def _segment(word, vocab, max_len):
    p, pieces = 0, []
    while p < len(word):
        bl = 1
        for l in range(min(max_len, len(word) - p), 0, -1):
            if word[p : p + l] in vocab:
                bl = l
                break
        pieces.append(word[p : p + bl])
        p += bl
    return pieces


def test_segment_matches_replay(spark):
    rng = random.Random(5)
    alpha = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(rng.randint(1, 15))
        )
        for _ in range(40)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    vocab = wordpiece_vocab(df, max_len=4, min_count=3)
    vset = {r["piece"] for r in vocab.collect()}
    assert vset == _vocab(texts, 4, 3)
    words = {w for t in texts for w in t.split(" ") if w}
    wdf = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: (r["n_pieces"], r["pieces"])
        for r in wordpiece_segment(wdf, vocab, max_len=4).collect()
    }
    for w in words:
        exp = _segment(w, vset, 4)
        assert got[w] == (len(exp), "|".join(exp)), (w, got[w], exp)


def test_greedy_is_longest_match_first(spark):
    # vocab has "ab", "abc" and singles; greedy takes "abc" not "ab"
    v = spark.createDataFrame(
        [("abc",), ("ab",), ("a",), ("b",), ("c",), ("d",)],
        "piece string",
    )
    w = spark.createDataFrame([("abcd",), ("abd",)], "word string")
    got = {
        r["word"]: r["pieces"]
        for r in wordpiece_segment(w, v, max_len=3).collect()
    }
    assert got["abcd"] == "abc|d"
    assert got["abd"] == "ab|d"


def test_unknown_char_fallback(spark):
    # a char outside the vocab consumes one position as-is
    v = spark.createDataFrame([("a",)], "piece string")
    w = spark.createDataFrame([("axa",)], "word string")
    r = wordpiece_segment(w, v, max_len=2).collect()[0]
    assert r["pieces"] == "a|x|a" and r["n_pieces"] == 3


def test_fertility_per_source(spark):
    df = spark.createDataFrame(
        [("s0", "abab abab cd"), ("s1", "abab cd cd")],
        "source string, text string",
    )
    out = {
        r["source"]: r
        for r in wordpiece_fertility_per_source(
            df, max_len=4, min_count=2
        ).collect()
    }
    vset = _vocab(["abab abab cd", "abab cd cd"], 4, 2)
    for src, text in (("s0", "abab abab cd"), ("s1", "abab cd cd")):
        words = [w for w in text.split(" ") if w]
        pieces = sum(len(_segment(w, vset, 4)) for w in words)
        assert out[src]["n_words"] == len(words)
        assert out[src]["n_pieces"] == pieces
        assert out[src]["fertility"] == pytest.approx(
            round(pieces / len(words), 6)
        )


def test_validation(spark):
    df = spark.createDataFrame([("s", "ab")], "source string, text string")
    with pytest.raises(ValueError):
        wordpiece_vocab(df, max_len=0)
