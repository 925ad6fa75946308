"""RefinedWeb line-wise corrections (Penedo 2023 App. G.2): hand cases
plus random-corpus equality against an independent Python replay."""

from __future__ import annotations

import random
import re

import pytest

from bloomine_spark.operators.textops import (
    REFINEDWEB_COUNTER_WORDS,
    REFINEDWEB_NAV_WORDS,
    refinedweb_line_correct,
)

_COUNTER_RE = re.compile(
    "^[0-9]+ (" + "|".join(REFINEDWEB_COUNTER_WORDS) + ")$"
)


def _line_removed(l: str) -> bool:
    n_up = sum(c.isascii() and c.isupper() for c in l)
    n_al = sum(c.isascii() and c.isalpha() for c in l)
    if n_al and n_up * 2 > n_al:
        return True
    if l and all(c in "-0123456789 .,:%/" for c in l) and any(
        c.isdigit() for c in l
    ):
        return True
    if _COUNTER_RE.match(l.strip().lower()):
        return True
    if l.strip().lower() in {w.lower() for w in REFINEDWEB_NAV_WORDS}:
        return True
    return False


def _replay(text: str, pct: int = 50) -> dict:
    ls = text.split("\n")
    kept = [l for l in ls if not _line_removed(l)]
    kt = "\n".join(kept)
    removed = len(text) - len(kt)
    drop = removed * 100 > pct * len(text)
    return {
        "text": kt,
        "n_lines_kept": len(kept),
        "n_lines_removed": len(ls) - len(kept),
        "removed_char_frac": round(removed / max(len(text), 1), 6),
        "keep": not drop,
        "reason": "excess_removal" if drop else None,
    }


def _run(spark, texts, **kw):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r["doc_id"]: r.asDict()
        for r in refinedweb_line_correct(df, **kw).collect()
    }


def test_hand_cases(spark):
    body = "good content line long enough to stay under half removed"
    texts = [
        "a normal line of text here\nanother fine line",   # untouched
        body + "\nBUY NOW LIMITED OFFER",                  # shouting line
        body + "\n2026-08-18 12:00",                       # numeric line
        body + "\n42 likes",                               # counter
        body + "\nLogin",                                  # nav word
        "SHOUT ONE\nSHOUT TWO\nok",                        # mostly removed
        "",                                                # empty keeps
        "MixedCase Line Stays Here fine",  # <=50% uppercase letters kept
    ]
    got = _run(spark, texts)
    assert got[0]["n_lines_removed"] == 0 and got[0]["keep"]
    for i in (1, 2, 3, 4):
        assert got[i]["n_lines_removed"] == 1, i
        assert got[i]["text"] == body, i
        assert got[i]["keep"], i
    assert not got[5]["keep"] and got[5]["reason"] == "excess_removal"
    assert got[6]["keep"] and got[6]["n_lines_kept"] == 1  # "" one empty line
    assert got[7]["n_lines_removed"] == 0


def test_matches_python_replay_random(spark):
    rng = random.Random(99)
    pieces = [
        "plain words in a line", "BUY NOW", "100 likes", "12,345",
        "login", "Menu", "ok then", "A B c d e", "3/4", "UPPER low",
        "42 followers", "print", "some longer sentence with words.",
        "", " ", "7 views extra",  # counter with suffix -> NOT removed
    ]
    texts = []
    for _ in range(80):
        n = rng.randint(0, 8)
        texts.append("\n".join(rng.choice(pieces) for _ in range(n)))
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        exp = _replay(t)
        g = got[i]
        for k in exp:
            assert g[k] == pytest.approx(exp[k]) if k == "removed_char_frac" \
                else g[k] == exp[k], (i, k, g[k], exp[k], repr(t))


def test_pct_override(spark):
    t = "KEEPING IT LOUD\nquiet line that is longer than the loud one"
    strict = _run(spark, [t], max_removed_pct=10)[0]
    assert not strict["keep"]
    lax = _run(spark, [t], max_removed_pct=90)[0]
    assert lax["keep"]
