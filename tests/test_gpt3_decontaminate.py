"""GPT-3 window decontamination (Brown 2020 App. C): hand-built split
cases plus random-corpus equality against an independent Python replay
(regex-free position scan, interval union via char sets)."""

from __future__ import annotations

import random

import pytest

from bloomine_spark.operators.dedup import gpt3_window_decontaminate


def _replay(train, test, n, window, min_piece, max_pieces):
    """Per-doc replay: collect eval n-grams, scan train words, paint
    removal chars, cut complement pieces."""
    def grams(text):
        ws = text.split(" ")
        starts, s = [], 0
        for w in ws:
            starts.append(s)
            s += len(w) + 1
        out = []
        for i in range(len(ws) - n + 1):
            g = tuple(ws[i : i + n])
            glen = sum(len(x) for x in g) + n - 1
            out.append((g, starts[i], glen))
        return out

    eval_set = set()
    for _, t in test:
        for g, _, _ in grams(t):
            eval_set.add(g)

    rows = []
    for i, t in train:
        removed: set[int] = set()
        hit = False
        for g, st, gl in grams(t):
            if g in eval_set:
                hit = True
                removed.update(
                    range(max(st - window, 0), min(st + gl + window, len(t)))
                )
        if not hit:
            rows.append((i, 0, t, len(t), False))
            continue
        pieces, cur = [], None
        for p in range(len(t)):
            if p in removed:
                cur = None
            else:
                if cur is None:
                    cur = [p, p]
                    pieces.append(cur)
                cur[1] = p
        kept = [
            (s, e + 1) for s, e in pieces if e + 1 - s >= min_piece
        ]
        if len(kept) > max_pieces:
            continue
        for idx, (s, e) in enumerate(kept):
            rows.append((i, idx, t[s:e], e - s, True))
    return sorted(rows)


def _run(spark, train, test, **kw):
    tr = spark.createDataFrame(train, "doc_id long, text string")
    te = spark.createDataFrame(test, "doc_id long, text string")
    rows = gpt3_window_decontaminate(tr, te, **kw).collect()
    return sorted(
        (r["doc_id"], r["piece_idx"], r["text"], r["n_chars"],
         r["contaminated"])
        for r in rows
    )


def test_hand_split_case(spark):
    # doc: clean prefix | colliding trigram | clean suffix; window=2
    # cuts 2 chars each side of the gram span
    t = "alpha beta gamma BAD WORDS HERE delta epsilon zeta"
    test = [(0, "prefix BAD WORDS HERE suffix")]
    got = _run(
        spark, [(1, t)], test, n=3, window=2, min_piece_chars=3,
        max_pieces=10,
    )
    exp = _replay([(1, t)], test, 3, 2, 3, 10)
    assert got == exp
    # the gram "BAD WORDS HERE" spans [17, 31); window 2 -> cut [15, 33)
    assert got == [
        (1, 0, t[:15], 15, True),
        (1, 1, t[33:], len(t) - 33, True),
    ]


def test_untouched_doc_passes_whole(spark):
    got = _run(
        spark, [(5, "nothing shared at all here")],
        [(0, "completely different eval text")],
        n=3, window=2, min_piece_chars=1,
    )
    assert got == [(5, 0, "nothing shared at all here", 26, False)]


def test_shatter_cap_and_min_piece(spark):
    # two separated collisions; min_piece kills the short middle piece
    t = "aa bb cc SPILL ONE dd ee ff gg hh SPILL TWO ii jj kk"
    test = [(0, "x SPILL ONE y"), (1, "x SPILL TWO y")]
    got = _run(spark, [(1, t)], test, n=2, window=1,
               min_piece_chars=8, max_pieces=10)
    exp = _replay([(1, t)], test, 2, 1, 8, 10)
    assert got == exp and len(got) >= 1
    # cap of 1 piece drops the doc entirely
    got1 = _run(spark, [(1, t)], test, n=2, window=1,
                min_piece_chars=8, max_pieces=1)
    exp1 = _replay([(1, t)], test, 2, 1, 8, 1)
    assert got1 == exp1


def test_matches_python_replay_random(spark):
    rng = random.Random(42)
    vocab = [f"v{i}" for i in range(30)]
    test = []
    for j in range(5):
        test.append(
            (j, " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 12))))
        )
    train = []
    for i in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 40))]
        # plant eval fragments into some docs
        if words and rng.random() < 0.5:
            frag = test[rng.randrange(len(test))][1].split(" ")
            k = rng.randint(0, len(words))
            words = words[:k] + frag[: rng.randint(2, len(frag))] + words[k:]
        train.append((i, " ".join(words)))
    kw = dict(n=4, window=5, min_piece_chars=6, max_pieces=4)
    got = _run(spark, train, test, **kw)
    exp = _replay(train, test, 4, 5, 6, 4)
    assert got == exp


def test_validation(spark):
    tr = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        gpt3_window_decontaminate(tr, tr, n=0)


def test_min_piece_zero_never_emits_empty_pieces(spark):
    # collision at char 0: the leading complement slot is empty and must
    # NOT become a piece even at min_piece_chars=0
    t = "BAD HIT here trailing words stay"
    test = [(0, "x BAD HIT y")]
    got = _run(spark, [(1, t)], test, n=2, window=0,
               min_piece_chars=0, max_pieces=10)
    exp = _replay([(1, t)], test, 2, 0, 0, 10)
    assert got == exp
    assert all(r[3] > 0 and r[2] != "" for r in got)
    assert got[0][1] == 0          # first surviving piece is idx 0
