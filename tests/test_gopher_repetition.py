"""Gopher repetition rule pack (Rae 2021 Table A1): hand-computed cases,
random-corpus equality against an independent Python replay (position-set
union for dup-gram coverage — exact), and threshold overrides."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from bloomine_spark.operators.textops import (
    GOPHER_REPETITION_THRESHOLDS,
    gopher_repetition,
)


def _replay(text: str) -> dict:
    """Independent per-doc replay of every metric."""
    out = {"n_chars": len(text)}
    nc = max(len(text), 1)

    def units(sep):
        us = [u for u in text.split(sep) if u != ""]
        c = Counter(us)
        return (
            len(us),
            sum(v - 1 for v in c.values()),
            sum((v - 1) * len(u) for u, v in c.items()),
        )

    nl, dl, dlc = units("\n")
    np_, dp, dpc = units("\n\n")
    out["n_lines"], out["n_paras"] = nl, np_
    out["dup_line_frac"] = round(dl / max(nl, 1), 6)
    out["dup_para_frac"] = round(dp / max(np_, 1), 6)
    out["dup_line_char_frac"] = round(dlc / nc, 6)
    out["dup_para_char_frac"] = round(dpc / nc, 6)

    words = text.split(" ")
    starts, s = [], 0
    for w in words:
        starts.append(s)
        s += len(w) + 1

    gram_num = {}
    for n in range(2, 11):
        grams: dict[tuple, list[tuple[int, int]]] = {}
        for i in range(len(words) - n + 1):
            g = tuple(words[i : i + n])
            glen = sum(len(x) for x in g) + n - 1
            grams.setdefault(g, []).append((starts[i], glen))
        if n <= 4:
            # most frequent gram among true repeats, ties -> longer
            cands = [
                (len(occ), occ[0][1])
                for occ in grams.values()
                if len(occ) >= 2
            ]
            top = max(cands) if cands else (0, 0)
            gram_num[f"top{n}_char_frac"] = top[0] * top[1]
        else:
            # exact positional union over all occurrences of repeats
            covered: set[int] = set()
            for occ in grams.values():
                if len(occ) >= 2:
                    for st, ln in occ:
                        covered.update(range(st, st + ln))
            gram_num[f"dup{n}_char_frac"] = len(covered)
    for name, v in gram_num.items():
        out[name] = round(v / nc, 6)

    thr = dict(GOPHER_REPETITION_THRESHOLDS)
    reason = None
    for name, _ in GOPHER_REPETITION_THRESHOLDS:
        num = {
            "dup_line_frac": dl, "dup_para_frac": dp,
            "dup_line_char_frac": dlc, "dup_para_char_frac": dpc,
        }.get(name, gram_num.get(name))
        den = {"dup_line_frac": nl, "dup_para_frac": np_}.get(
            name, len(text)
        )
        if num * 100 > thr[name] * den:
            reason = name
            break
    out["keep"] = reason is None
    out["reason"] = reason
    return out


FRAC_COLS = [name for name, _ in GOPHER_REPETITION_THRESHOLDS]


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in gopher_repetition(df).collect()
    }


def test_hand_cases(spark):
    texts = [
        "a b c d e f g h",                        # clean -> keep
        "x y z\nx y z\nq w e",                    # 1 of 3 lines repeats
        ("spam ham " * 12).strip(),               # degenerate loop
        "p q r\n\np q r\n\nother text here",      # dup paragraph
        "",                                       # empty -> keep
    ]
    got = _run(spark, texts)
    assert got[0]["keep"] and got[0]["reason"] is None
    assert got[1]["reason"] == "dup_line_frac"
    assert got[1]["dup_line_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[1]["dup_line_char_frac"] == pytest.approx(5 / 17, abs=1e-6)
    assert got[2]["reason"] == "top2_char_frac"
    assert got[2]["dup5_char_frac"] == 1.0
    assert got[3]["reason"] == "dup_line_frac"  # paras are lines too here
    assert got[3]["dup_para_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert got[4]["keep"] and got[4]["n_chars"] == 0


def test_matches_python_replay_random(spark):
    rng = random.Random(1234)
    vocab = ["aa", "b", "ccc", "dd", "e", "fff", "gg"]
    texts = []
    for _ in range(60):
        n = rng.randint(0, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        # plant loops/repeated lines in some docs
        if n and rng.random() < 0.4:
            seg = words[: rng.randint(1, min(8, n))]
            words = words + seg * rng.randint(1, 3)
        t = " ".join(words)
        if rng.random() < 0.4:
            t = t.replace(" ", "\n", rng.randint(0, 3))
        if rng.random() < 0.3:
            t = t + "\n\n" + t[: rng.randint(0, len(t))]
        texts.append(t)
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        exp = _replay(t)
        g = got[i]
        for k in ("n_chars", "n_lines", "n_paras", "keep", "reason"):
            assert g[k] == exp[k], (i, k, g[k], exp[k], repr(t))
        for k in FRAC_COLS:
            assert g[k] == pytest.approx(exp[k], abs=2e-6), (
                i, k, g[k], exp[k], repr(t),
            )


def test_threshold_override(spark):
    # a mild repeat passes the paper thresholds but fails a tight one
    t = "u v w x y z u v other words here now today maybe fine ok"
    df = spark.createDataFrame([(0, t)], "doc_id long, text string")
    base = gopher_repetition(df).collect()[0]
    assert base["keep"]
    tight = gopher_repetition(
        df, thresholds={"top2_char_frac": 0}
    ).collect()[0]
    assert not tight["keep"] and tight["reason"] == "top2_char_frac"


def test_unknown_threshold_name_raises(spark):
    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="dup5_charfrac"):
        gopher_repetition(df, thresholds={"dup5_charfrac": 0})
