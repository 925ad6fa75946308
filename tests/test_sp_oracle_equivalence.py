"""The promoted queries' DuckDB oracle (_sp_score_cte) must equal the SP
kernel semantics on ARBITRARY inputs, not just the driver corpus: fuzz
random small-vocab docs and compare the SQL pipeline row-for-row against a
direct Python evaluation that calls the kernel's own score_runs.

Pins the derivation: at k=2 gap_threshold==1, fragments = maximal covered
token runs (matched windows paint 2-token intervals), and the X9 fragment
DP equals max_j(Q_j + running_max(s_i - Q_i)) over prefix sums — which is
what the window SQL computes.
"""

import random

import duckdb
import numpy as np
import pandas as pd
import pytest

from bloomine_spark.operators.screen import score_runs
from bloomine_spark.params import ScreenParams

import __spark_entry__ as em

PHRASE = "alpha beta gamma"
G1, G2 = "alpha beta", "beta gamma"
VOCAB = ["alpha", "beta", "gamma", "delta", "w1", "w2"]
P = ScreenParams(k=2)


def _expected_row(words):
    """(rc, score) per the kernel semantics, or None when FP fails both
    orientations (no score-log row)."""

    def windows(ws):
        return [f"{a} {b}" for a, b in zip(ws, ws[1:])]

    def covered_mask(ws):
        n = len(ws)
        mask = np.zeros(n, dtype=bool)
        for i, g in enumerate(windows(ws)):
            if g in (G1, G2):
                mask[i:i + 2] = True
        return mask

    def score(ws):
        mask = covered_mask(ws)
        if not mask.any():
            return None
        edges = np.flatnonzero(np.diff(mask.astype(np.int8)))
        starts = np.concatenate(([0], edges + 1))
        ends = np.concatenate((edges + 1, [len(mask)]))
        return score_runs(mask[starts], ends - starts, P)

    fwd = any(g in (G1, G2) for g in windows(words))
    if fwd:
        return (False, score(words))
    rev = list(reversed(words))
    if any(g in (G1, G2) for g in windows(rev)):
        return (True, score(rev))
    return None


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_sp_score_cte_matches_kernel_on_random_docs(seed):
    rng = random.Random(seed)
    docs = []
    for doc_id in range(250):
        n = rng.randrange(0, 28)
        words = [rng.choice(VOCAB) for _ in range(n)]
        # plant full/partial occurrences in a fraction of docs so covered
        # runs, multi-fragment and rc-only cases all appear
        r = rng.random()
        if r < 0.2 and n >= 3:
            i = rng.randrange(0, n - 2)
            words[i:i + 3] = ["alpha", "beta", "gamma"]
        elif r < 0.35 and n >= 3:
            i = rng.randrange(0, n - 2)
            words[i:i + 3] = ["gamma", "beta", "alpha"]  # rc-only hit
        docs.append({"doc_id": doc_id, "text": " ".join(words)})
    pdf = pd.DataFrame(docs)

    con = duckdb.connect()
    con.register("documents", pdf)
    cte = em._sp_score_cte("h", PHRASE)
    got = con.sql(
        f"WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t "
        f"FROM documents), {cte} "
        "SELECT doc_id, rc, score FROM score_h ORDER BY doc_id"
    ).df()
    got_rows = {
        int(r["doc_id"]): (bool(r["rc"]), int(r["score"]))
        for _, r in got.iterrows()
    }

    want_rows = {}
    for d in docs:
        exp = _expected_row(d["text"].split(" ") if d["text"] else [])
        if exp is not None:
            want_rows[d["doc_id"]] = exp
    assert got_rows == want_rows
