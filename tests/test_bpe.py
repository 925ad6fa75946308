"""BPE merge learning vs a pure-Python reference implementation of the
same deterministic contract (Sennrich 2016 greedy merges, ties by
(lhs, rhs) string order) — hand fixtures, a=b run edge cases, and a
seeded fuzz over random corpora."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.bpe import (
    bpe_merge_table,
    bpe_source_stats,
    learn_bpe,
)


def ref_bpe(word_freqs: dict[str, int], n_merges: int):
    """Reference: dict-based BPE with the module's exact contract."""
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, c))
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out
    return merges, syms


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def _freqs(rows):
    out: dict[str, int] = {}
    for _, _, text in rows:
        for w in text.split(" "):
            if w:
                out[w] = out.get(w, 0) + 1
    return out


def _check(spark, rows, n_merges):
    docs = _docs(spark, rows)
    merges, words = learn_bpe(docs, n_merges)
    ref_merges, ref_syms = ref_bpe(_freqs(rows), n_merges)
    got = [(m["merge_rank"], m["lhs"], m["rhs"], m["pair_count"])
           for m in merges]
    assert got == ref_merges
    got_syms = {r["word"]: list(r["syms"]) for r in words.collect()}
    assert got_syms == ref_syms
    return merges


def test_bpe_hand_fixture(spark):
    # classic Sennrich corpus; 'es' (in newest/widest, freq 9) wins first
    rows = []
    i = 0
    for w, f in [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]:
        for _ in range(f):
            rows.append((i, "s0", w))
            i += 1
    merges = _check(spark, rows, 6)
    assert (merges[0]["lhs"], merges[0]["rhs"], merges[0]["pair_count"]) == (
        "e", "s", 9)


def test_bpe_equal_pair_runs(spark):
    # lhs == rhs runs: greedy must take every other occurrence, and the
    # second round must see the merged symbols, not the original chars
    rows = [(0, "s0", "aaaa aaa aa a"), (1, "s0", "aaaaa b")]
    _check(spark, rows, 4)


def test_bpe_tie_break_and_early_stop(spark):
    # all pairs count 1 -> pure (lhs, rhs) tie-break; corpus exhausts
    # before 10 merges -> early stop with fewer rows
    rows = [(0, "s0", "ba dc"), (1, "s1", "fe")]
    docs = _docs(spark, rows)
    merges, _ = learn_bpe(docs, 10)
    ref_merges, _ = ref_bpe(_freqs(rows), 10)
    assert [(m["lhs"], m["rhs"]) for m in merges] == [
        (a, b) for _, a, b, _ in ref_merges]
    assert merges[0]["lhs"] == "b"  # ('b','a') < ('d','c') < ('f','e')
    assert len(merges) < 10


def test_bpe_no_pairs(spark):
    rows = [(0, "s0", "a b c"), (1, "s0", "a")]
    assert bpe_merge_table(_docs(spark, rows), 5).count() == 0


def test_bpe_fuzz_vs_reference(spark):
    rng = random.Random(20260817)
    alphabet = "abc"
    for trial in range(3):
        rows = []
        for i in range(60):
            nw = rng.randint(1, 6)
            words = [
                "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(1, 7)))
                for _ in range(nw)
            ]
            rows.append((i, f"s{i % 3}", " ".join(words)))
        _check(spark, rows, 8)


def test_bpe_source_stats(spark):
    rows = [(0, "s0", "low lower"), (1, "s1", "newest widest newest"),
            (2, "s1", "low")]
    n = 4
    stats = {r["source"]: r
             for r in bpe_source_stats(_docs(spark, rows), n).collect()}
    _, ref_syms = ref_bpe(_freqs(rows), n)
    exp = {}
    for _, src, text in rows:
        for w in text.split(" "):
            if w:
                e = exp.setdefault(src, [0, 0])
                e[0] += 1
                e[1] += len(ref_syms[w])
    for src, (nw, ns) in exp.items():
        assert stats[src]["n_words"] == nw
        assert stats[src]["n_subwords"] == ns
        assert stats[src]["fertility"] == pytest.approx(ns / nw)


def test_bpe_partition_invariance(spark):
    # the learned merges are a pure function of the corpus, not its layout
    rows = [(i, f"s{i % 2}", t) for i, t in enumerate(
        ["the cat sat", "the mat", "that hat", "the that the"] * 5)]
    a = [tuple(r) for r in bpe_merge_table(
        _docs(spark, rows).repartition(1), 5).collect()]
    b = [tuple(r) for r in bpe_merge_table(
        _docs(spark, rows).repartition(13, F.col("doc_id")), 5).collect()]
    assert a == b and len(a) == 5


def test_bpe_transfer_vs_reference(spark):
    """Train on even doc_ids, encode everything: subword counts and OOV
    flags match a pure-python replay, including unseen words (which must
    still be fully encodable as characters + any applicable merges)."""
    from pyspark.sql import functions as F
    from bloomine_spark.operators.bpe import bpe_transfer_stats

    rows = [(i, f"s{i % 2}", t) for i, t in enumerate(
        ["low lower lowest", "newest widest", "lowly newly",
         "bestow stowing", "unseen wordforms here", "low newest"])]
    n = 6
    got = {r["source"]: r for r in bpe_transfer_stats(
        _docs(spark, rows), n,
        train_pred=(F.col("doc_id") % 2 == 0)).collect()}

    train_freqs = _freqs([r for r in rows if r[0] % 2 == 0])
    merges, _ = ref_bpe(train_freqs, n)
    exp: dict[str, list] = {}
    for i, src, text in rows:
        for w in text.split(" "):
            if not w:
                continue
            s = list(w)
            for _, a, b, _ in merges:
                out, j = [], 0
                while j < len(s):
                    if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                        out.append(a + b)
                        j += 2
                    else:
                        out.append(s[j])
                        j += 1
                s = out
            e = exp.setdefault(src, [0, 0, 0])
            e[0] += 1
            e[1] += len(s)
            e[2] += 0 if w in train_freqs else 1
    for src, (nw, ns, oov) in exp.items():
        assert got[src]["n_words"] == nw
        assert got[src]["n_subwords"] == ns
        assert got[src]["n_oov_words"] == oov
    assert any(v[2] > 0 for v in exp.values())  # the fixture has real OOV
