"""Heaps' law fit: equality against a numpy polyfit replay on the same
cumulative points, exact-power-law recovery, and degenerate guards."""

from __future__ import annotations

import math
import random

import numpy as np
import pytest

from bloomine_spark.operators.textops import heaps_fit_per_source


def _replay(docs):
    """Independent cumulative-curve + polyfit replay per source."""
    by_src: dict[str, list[tuple[int, list[str]]]] = {}
    for src, i, t in docs:
        by_src.setdefault(src, []).append(
            (i, [w for w in t.split(" ") if w != ""])
        )
    out = {}
    for src, rows in by_src.items():
        rows.sort()
        seen: set[str] = set()
        cn = cv = 0
        xs, ys = [], []
        for _, words in rows:
            if not words:
                continue  # no token row -> absent from per_doc
            cn += len(words)
            for w in words:
                if w not in seen:
                    seen.add(w)
                    cv += 1
            if cn > 0 and cv > 0:
                xs.append(math.log(cn))
                ys.append(math.log(cv))
        if len(xs) >= 2 and max(xs) > min(xs):
            beta, lnk = np.polyfit(xs, ys, 1)
        else:
            beta = lnk = None
        out[src] = (len(xs), beta, lnk)
    return out


def _run(spark, docs):
    df = spark.createDataFrame(
        docs, "source string, doc_id long, text string"
    )
    return {
        r["source"]: (r["n_docs_fit"], r["beta"], r["ln_k"])
        for r in heaps_fit_per_source(df).collect()
    }


def test_exact_power_law_recovered(spark):
    # build a corpus whose cumulative curve is exactly V = 2 * n^0.5:
    # doc i takes the curve from n=(2i)^2... easier: pick points on the
    # law and emit docs that land the cumulative counts on them
    pts = [(4, 4), (16, 8), (64, 16), (256, 32)]  # V = 2*sqrt(n)
    docs, prev_n, vocab_used = [], 0, 0
    for i, (n, v) in enumerate(pts):
        n_tok = n - prev_n
        n_new = v - vocab_used
        words = [f"w{vocab_used + j}" for j in range(n_new)]
        words += ["w0"] * (n_tok - n_new)
        docs.append(("a", i, " ".join(words)))
        prev_n, vocab_used = n, v
    got = _run(spark, docs)
    n_fit, beta, lnk = got["a"]
    assert n_fit == 4
    assert beta == pytest.approx(0.5, abs=1e-9)
    assert lnk == pytest.approx(math.log(2.0), abs=1e-9)


def test_matches_polyfit_replay_random(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(300)]
    docs = []
    i = 0
    for src in ("a", "b", "c"):
        for _ in range(rng.randint(3, 12)):
            n = rng.randint(0, 50)
            docs.append(
                (src, i, " ".join(rng.choice(vocab) for _ in range(n)))
            )
            i += 1
    got = _run(spark, docs)
    exp = _replay(docs)
    assert set(got) == set(exp)
    for src in exp:
        en, eb, ek = exp[src]
        gn, gb, gk = got[src]
        assert gn == en, src
        if eb is None:
            assert gb is None and gk is None, src
        else:
            assert gb == pytest.approx(eb, abs=1e-9), src
            assert gk == pytest.approx(ek, abs=1e-9), src


def test_degenerate_sources_null(spark):
    docs = [
        ("one", 0, "a b c"),          # single point -> denom 0 -> NULL
        ("empty", 1, ""),             # no tokens -> no row at all
    ]
    got = _run(spark, docs)
    assert got["one"] == (1, None, None)
    assert "empty" not in got
