"""Best-Fit-Decreasing packing (Ding 2024): python-replay equality,
capacity/no-truncation invariants, the BFD fill bound, over-long doc
splitting, and partition invariance."""

from __future__ import annotations

import math
import random

from bloomine_spark.operators.packing import bestfit_pack

W = 100


def _ref_bfd(toks, W):
    """Independent replay: linear-scan best fit over open bins."""
    pieces, out, nbins = [], {}, 0
    for d in sorted(toks):
        n, p = toks[d], 0
        while n > W:
            out[(d, p)] = (nbins, W)
            nbins += 1
            n -= W
            p += 1
        if n > 0:
            pieces.append((n, d, p))
    pieces.sort(key=lambda t: (-t[0], t[1], t[2]))
    rem = {}  # bin -> remaining
    for size, d, p in pieces:
        cands = [(r, b) for b, r in rem.items() if r >= size]
        if cands:
            # best fit: smallest remaining, ties lowest bin id
            b = min(cands)[1]
        else:
            b = nbins
            nbins += 1
            rem[b] = W
        out[(d, p)] = (b, size)
        rem[b] -= size
        if rem[b] == 0:
            del rem[b]
    return out, nbins


def _df(spark, toks, parts=1):
    rows = [(d, "s", n) for d, n in toks.items()]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    return df.repartition(parts) if parts > 1 else df


def _collect(spark, toks, parts=1, segment_rows=100_000):
    return {
        (r["id"], r["piece"]): (r["bin_id"], r["piece_tok"], r["bin_fill"])
        for r in bestfit_pack(
            _df(spark, toks, parts), W, segment_rows=segment_rows
        ).collect()
    }


def test_matches_python_replay_and_invariants(spark):
    rng = random.Random(3)
    toks = {d: rng.randint(1, 140) for d in range(400)}
    got = _collect(spark, toks)
    ref, nbins = _ref_bfd(toks, W)
    assert {k: v[:2] for k, v in got.items()} == ref
    # capacity: per-bin piece sums equal the reported fill and fit W
    fills = {}
    for (d, p), (b, size, fill) in got.items():
        fills.setdefault(b, [0, fill])
        fills[b][0] += size
        assert fills[b][1] == fill
    assert all(s == f and f <= W for s, f in fills.values())
    # every token placed exactly once, no truncation of ≤W docs
    assert sum(s for _, s, _ in got.values()) == sum(toks.values())
    for d, n in toks.items():
        npieces = len([1 for (dd, _) in got if dd == d])
        assert npieces == (1 if n <= W else math.ceil(n / W))
    # BFD guarantee: bins within 11/9·OPT + 1 of the volume lower bound
    opt = math.ceil(sum(toks.values()) / W)
    assert len(fills) == nbins <= math.ceil(11 * opt / 9) + 1


def test_overlong_docs_full_bins(spark):
    got = _collect(spark, {7: 250, 8: 40})
    # doc 7 → two full bins (100+100) + a 50 remainder packed with doc 8
    assert got[(7, 0)][1] == 100 and got[(7, 1)][1] == 100
    assert got[(7, 2)][1] == 50
    assert got[(7, 2)][0] == got[(8, 0)][0]  # 50+40 share one bin
    assert got[(7, 2)][2] == 90


def test_partition_invariance(spark):
    rng = random.Random(11)
    toks = {d: rng.randint(1, 99) for d in range(300)}
    assert _collect(spark, toks, parts=1) == _collect(spark, toks, parts=7)


def test_segmenting_bounds_kernel_and_keeps_everything(spark):
    rng = random.Random(13)
    toks = {d: rng.randint(1, 99) for d in range(500)}
    got = _collect(spark, toks, parts=5, segment_rows=100)
    assert sum(s for _, s, _ in got.values()) == sum(toks.values())
    segs = {
        r["segment"]
        for r in bestfit_pack(
            _df(spark, toks, 5), W, segment_rows=100
        ).collect()
    }
    assert len(segs) == 5  # ceil(500/100) md5 segments actually used


def test_chunk_token_windows_shapes(spark):
    import pandas as pd

    from bloomine_spark.operators.packing import chunk_token_windows

    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": " ".join(f"w{i}" for i in range(10))},  # n=10
        {"doc_id": 2, "text": " ".join(f"w{i}" for i in range(13))},  # n=13
        {"doc_id": 3, "text": "a b"},                                  # n=2
        {"doc_id": 4, "text": ""},                                     # none
    ]))
    out = chunk_token_windows(docs, window=8, overlap=3)  # stride 5
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # n=10 > 8: K = 1 + ceil(2/5) = 2 chunks at starts 0, 5
    assert {(k[0], k[1]) for k in rows if k[0] == 1} == {(1, 0), (1, 1)}
    assert rows[(1, 0)]["text"].split() == [f"w{i}" for i in range(8)]
    assert rows[(1, 1)]["start_tok"] == 5
    assert rows[(1, 1)]["n_tokens"] == 5
    assert rows[(1, 1)]["text"].split() == [f"w{i}" for i in range(5, 10)]
    # n=13: K = 1 + ceil(5/5) = 2 -> starts 0, 5; chunk1 covers 5..12
    assert {(k[0], k[1]) for k in rows if k[0] == 2} == {(2, 0), (2, 1)}
    assert rows[(2, 1)]["n_tokens"] == 8
    # a tail fully contained in its predecessor never appears: every
    # chunk after the first extends past the previous end
    for (d, c), r in rows.items():
        if c > 0:
            prev_end = rows[(d, c - 1)]["start_tok"] + rows[(d, c - 1)]["n_tokens"]
            assert r["start_tok"] + r["n_tokens"] > prev_end
    # short doc: one whole-doc chunk; empty doc: no chunks
    assert rows[(3, 0)]["n_tokens"] == 2
    assert not [k for k in rows if k[0] == 4]


def test_chunk_token_windows_coverage_and_overlap(spark):
    import pandas as pd

    from bloomine_spark.operators.packing import chunk_token_windows

    n = 103
    docs = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 9, "text": " ".join(f"t{i}" for i in range(n))},
    ]))
    out = chunk_token_windows(docs, window=32, overlap=8).collect()
    covered = set()
    for r in out:
        covered |= set(range(r["start_tok"], r["start_tok"] + r["n_tokens"]))
    assert covered == set(range(n))  # every token in some chunk
    # consecutive chunks overlap by exactly `overlap` except the tail
    starts = sorted(r["start_tok"] for r in out)
    assert all(b - a == 24 for a, b in zip(starts, starts[1:]))


def test_chunk_token_windows_validation_and_plan(spark):
    import pandas as pd
    import pytest as _pytest

    from bloomine_spark.operators.packing import chunk_token_windows

    docs = spark.createDataFrame(pd.DataFrame([{"doc_id": 1, "text": "a"}]))
    with _pytest.raises(ValueError, match="overlap"):
        chunk_token_windows(docs, window=8, overlap=8)
    with _pytest.raises(ValueError, match="window"):
        chunk_token_windows(docs, window=0)
    plan = (
        chunk_token_windows(docs)._jdf.queryExecution().executedPlan()
        .toString()
    ).split("== Initial Plan ==")[0]
    assert "Exchange" not in plan  # zero-exchange codegen explode
