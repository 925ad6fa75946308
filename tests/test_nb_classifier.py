"""Hashed-bigram Naive Bayes classifier: separable-language accuracy,
exact score equality against an independent Python replay (dict-based
NB, no decomposition), prior-only fallback, validation."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import pytest

from bloomine_spark.operators.classify import nb_classify, nb_train


def _bucket(g: str, n_buckets: int) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def _feats(text: str, n_buckets: int) -> Counter:
    return Counter(
        _bucket(text[i : i + 2], n_buckets) for i in range(len(text) - 1)
    )


def _replay(train, test, n_buckets, alpha):
    """Plain NB: per label, bucket counts; score every test doc with the
    full smoothed posterior over ALL its features."""
    counts: dict[str, Counter] = {}
    ndocs = Counter()
    for lab, t in train:
        counts.setdefault(lab, Counter()).update(_feats(t, n_buckets))
        ndocs[lab] += 1
    model_buckets = set()
    for c in counts.values():
        model_buckets.update(c)
    total = sum(ndocs.values())
    out = {}
    for i, t in test:
        f = _feats(t, n_buckets)
        best = None
        for lab in counts:
            T = sum(counts[lab].values())
            denom = math.log(T + alpha * n_buckets)
            s = math.log(ndocs[lab] / total)
            for b, tf in f.items():
                if b in model_buckets:
                    s += tf * (math.log(counts[lab][b] + alpha) - denom)
                else:
                    s += tf * (math.log(alpha) - denom)
            key = (round(s, 6), lab)
            if best is None or key[0] > best[0] or (
                key[0] == best[0] and lab < best[1]
            ):
                best = key
        out[i] = (best[1], best[0])
    return out


VOWELY = "aeiou"
CONSY = "xzkqw"


def _word(rng, alphabet):
    return "".join(rng.choice(alphabet) for _ in range(rng.randint(2, 6)))


def _doc(rng, alphabet, n=12):
    return " ".join(_word(rng, alphabet) for _ in range(n))


def test_separable_languages_perfect_accuracy(spark):
    rng = random.Random(3)
    train = [("vow", _doc(rng, VOWELY)) for _ in range(30)] + [
        ("con", _doc(rng, CONSY)) for _ in range(30)
    ]
    test = [(i, _doc(rng, VOWELY)) for i in range(10)] + [
        (i + 10, _doc(rng, CONSY)) for i in range(10)
    ]
    tr = spark.createDataFrame(train, "label string, text string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    model = nb_train(tr, n_buckets=128)
    got = {
        r["doc_id"]: r["label"]
        for r in nb_classify(te, model, n_buckets=128).collect()
    }
    for i in range(10):
        assert got[i] == "vow", i
        assert got[i + 10] == "con", i


def test_matches_python_replay_scores(spark):
    rng = random.Random(17)
    mixed = VOWELY + CONSY
    train = (
        [("a", _doc(rng, VOWELY)) for _ in range(8)]
        + [("b", _doc(rng, CONSY)) for _ in range(12)]
        + [("c", _doc(rng, mixed)) for _ in range(5)]
    )
    test = [(i, _doc(rng, mixed, n=rng.randint(1, 20)))
            for i in range(40)] + [(99, "")]
    tr = spark.createDataFrame(train, "label string, text string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    model = nb_train(tr, n_buckets=64, alpha=0.5)
    got = {
        r["doc_id"]: (r["label"], r["score"])
        for r in nb_classify(te, model, n_buckets=64).collect()
    }
    exp = _replay(train, test, 64, 0.5)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], (i, got[i], exp[i])
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6), i


def test_empty_doc_prior_only(spark):
    tr = spark.createDataFrame(
        [("big", "aa bb cc"), ("big", "dd ee"), ("small", "ff")],
        "label string, text string",
    )
    te = spark.createDataFrame([(0, "")], "doc_id long, text string")
    model = nb_train(tr, n_buckets=32)
    r = nb_classify(te, model, n_buckets=32).collect()[0]
    assert r["label"] == "big"       # argmax prior = 2/3
    assert r["score"] == pytest.approx(math.log(2 / 3), abs=1e-6)


def test_validation(spark):
    tr = spark.createDataFrame([("a", "xx")], "label string, text string")
    with pytest.raises(ValueError):
        nb_train(tr, n_buckets=0)
    with pytest.raises(ValueError):
        nb_train(tr, alpha=0)


def test_featureless_label_keeps_prior(spark):
    # 'xx' docs have no char bigrams (single-char texts) — the label must
    # stay in the model with the pure-alpha likelihoods, not vanish
    tr = spark.createDataFrame(
        [("en", "hello there"), ("en", "more text"), ("xx", "a"),
         ("xx", "b"), ("xx", "c")],
        "label string, text string",
    )
    model = nb_train(tr, n_buckets=32)
    labels = {r["label"] for r in model.select("label").distinct().collect()}
    assert labels == {"en", "xx"}
    # an empty doc scores on priors alone: xx (3/5) beats en (2/5)
    te = spark.createDataFrame([(0, "")], "doc_id long, text string")
    r = nb_classify(te, model, n_buckets=32).collect()[0]
    assert r["label"] == "xx"
    assert r["score"] == pytest.approx(math.log(3 / 5), abs=1e-6)
