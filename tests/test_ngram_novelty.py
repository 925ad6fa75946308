"""N-gram novelty (RAVEN): hand cases + random-corpus equality against
an independent Python replay (first-seen set scan in corpus order)."""

from __future__ import annotations

import random

import pytest

from bloomine_spark.operators.textops import ngram_novelty_per_source


def _replay(docs, max_n):
    """Scan docs in (doc_id) order, words left to right; per n, a gram
    occurrence is novel iff never seen before anywhere in the corpus."""
    out = {}  # (source, n) -> [total, novel]
    seen = {n: set() for n in range(1, max_n + 1)}
    for _, i, src, t in sorted((d[1], d[1], d[0], d[2]) for d in docs):
        words = t.split(" ")
        for n in range(1, max_n + 1):
            for j in range(len(words) - n + 1):
                gram = tuple(words[j : j + n])
                k = (src, n)
                out.setdefault(k, [0, 0])
                out[k][0] += 1
                if gram not in seen[n]:
                    seen[n].add(gram)
                    out[k][1] += 1
    return {
        k: (tot, nov, round(nov / tot, 6)) for k, (tot, nov) in out.items()
    }


def _run(spark, docs, max_n):
    df = spark.createDataFrame(
        docs, "source string, doc_id long, text string"
    )
    return {
        (r["source"], r["n"]): (
            r["n_occurrences"], r["n_novel"], r["novel_frac"],
        )
        for r in ngram_novelty_per_source(df, max_n=max_n).collect()
    }


def test_hand_case(spark):
    docs = [
        ("a", 0, "x y z"),
        ("b", 1, "x y q"),     # "x" "y" and bigram "x y" are repeats
        ("a", 2, "x y z"),     # everything a repeat of doc 0
    ]
    got = _run(spark, docs, 2)
    exp = _replay(docs, 2)
    assert got == exp
    assert got[("a", 1)] == (6, 3, 0.5)        # x y z novel; doc2 repeats
    assert got[("b", 1)] == (3, 1, pytest.approx(1 / 3, abs=1e-6))
    assert got[("a", 2)] == (4, 2, 0.5)        # "x y" "y z" then repeats
    assert got[("b", 2)] == (2, 1, 0.5)        # "x y" repeat, "y q" novel


def test_first_occurrence_attribution_order(spark):
    # the SAME gram in two sources: novelty goes to the lower doc_id
    docs = [("late", 5, "p q r"), ("early", 1, "p q r")]
    got = _run(spark, docs, 3)
    assert got[("early", 3)] == (1, 1, 1.0)
    assert got[("late", 3)] == (1, 0, 0.0)


def test_matches_python_replay_random(spark):
    rng = random.Random(13)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(80):
        n = rng.randint(0, 25)
        words = [rng.choice(vocab) for _ in range(n)]
        if words and rng.random() < 0.3 and docs:
            # copy a span from an earlier doc -> long-gram repeats
            src_words = docs[rng.randrange(len(docs))][2].split(" ")
            if src_words and src_words != [""]:
                a = rng.randrange(len(src_words))
                words += src_words[a : a + rng.randint(2, 10)]
        docs.append((f"s{i % 3}", i, " ".join(words)))
    # raw-split semantics: an empty doc contributes one empty-string
    # unigram (the engine does not filter), so the replay keeps it too
    got = _run(spark, docs, 6)
    exp = _replay(docs, 6)
    assert got == exp


def test_validation(spark):
    df = spark.createDataFrame(
        [("a", 0, "x")], "source string, doc_id long, text string"
    )
    with pytest.raises(ValueError):
        ngram_novelty_per_source(df, max_n=0)


def test_short_doc_and_all_short_source_edges(spark):
    # the closed-form totals (r7: max(width - n + 1, 0) summed per doc)
    # must mirror the window builder's shape exactly at the edges: a doc
    # shorter than n contributes 0 occurrences, and a (source, n) whose
    # docs are ALL shorter than n emits NO row at all (the old window
    # form could not produce a zero-occurrence totals row — a 0/0
    # division must never appear)
    docs = [
        ("a", 0, "x y z"),
        ("b", 1, "q"),          # 1 word: no bigrams/trigrams
        ("b", 2, "r"),
    ]
    got = _run(spark, docs, 3)
    exp = _replay(docs, 3)
    assert got == exp
    assert ("b", 2) not in got and ("b", 3) not in got
    assert got[("b", 1)] == (2, 2, 1.0)
    assert got[("a", 3)] == (1, 1, 1.0)


def test_null_text_contributes_nothing(spark):
    df = spark.createDataFrame(
        [("a", 0, "x y"), ("a", 1, None), ("b", 2, None)],
        "source string, doc_id long, text string",
    )
    got = {
        (r["source"], r["n"]): (r["n_occurrences"], r["n_novel"])
        for r in ngram_novelty_per_source(df, max_n=2).collect()
    }
    # null-text docs vanish from both the totals and the firsts; a
    # source with ONLY null docs has no rows
    assert got == {("a", 1): (2, 2), ("a", 2): (1, 1)}
