"""Harmonic centrality: exact BFS closure and HyperBall."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.centrality import (
    harmonic_centrality_exact,
    hyperball_harmonic,
)


def _ref_harmonic(edges):
    """Floyd–Warshall reference."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    INF = float("inf")
    d = np.full((n, n), INF)
    np.fill_diagonal(d, 0.0)
    for s, t in edges:
        d[idx[s], idx[t]] = 1.0
    for k in range(n):
        d = np.minimum(d, d[:, [k]] + d[[k], :])
    out = {}
    for v in nodes:
        col = d[:, idx[v]]
        mask = np.isfinite(col) & (col > 0)
        out[v] = float((1.0 / col[mask]).sum())
    return out


EDGES = [
    ("a", "b"), ("b", "c"), ("c", "d"),      # path: d gets 1 + 1/2 + 1/3
    ("d", "a"),                               # close the cycle
    ("e", "c"),                               # e: source-only (harmonic 0)
    ("a", "c"),                               # shortcut — min-dist matters
]


def test_exact_matches_floyd_warshall(spark):
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    got = {r["node"]: r["harmonic"] for r in harmonic_centrality_exact(df).collect()}
    want = _ref_harmonic(EDGES)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert got["e"] == 0.0  # no in-paths


def test_exact_node_guard(spark):
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    with pytest.raises(ValueError, match="max_nodes"):
        harmonic_centrality_exact(df, max_nodes=3)


def test_vectorized_kernel_parity_with_scalar_hll():
    """The batch init/fold/estimate kernels are byte- and float-exact
    twins of the scalar HyperLogLog paths."""
    from bloomine_spark.operators.centrality import (
        _estimate_matrix,
        _init_registers,
    )
    from bloomine_spark.sketch.hll import HyperLogLog

    rng = np.random.default_rng(3)
    for b in (8, 12):
        hashes = rng.integers(0, 2**63, 200, dtype=np.int64).view(np.uint64)
        regs = _init_registers(hashes, b)
        folded = regs.max(axis=0)
        s = HyperLogLog.empty(b, hashed_input=True)
        s.update_hashes(hashes)
        assert bytes(folded.tobytes()) == s.registers.tobytes()
        est = _estimate_matrix(folded[None, :], 1 << b)[0]
        assert est == pytest.approx(s.estimate(), rel=0, abs=0)


def test_hyperball_small_graph_near_exact(spark):
    """At 5 nodes / b=12 the counters sit deep in the linear-counting
    regime — estimates are within a fraction of a count, so harmonic
    sums land within 2% of exact."""
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    stats = {}
    got = {
        r["node"]: r["harmonic_est"]
        for r in hyperball_harmonic(df, stats=stats).collect()
    }
    want = _ref_harmonic(EDGES)
    for k, w in want.items():
        assert got[k] == pytest.approx(w, rel=0.02, abs=0.02)
    # fixpoint = diameter + 1 saturation round, well under max_iter
    assert stats["rounds"] <= 6


def test_hyperball_fold_spans_arrow_batches(spark):
    """One node's state copies can split across Arrow batches inside a
    partition (default 10k rows/batch): the fold must emit exactly ONE
    row per node — a per-batch fold leaks duplicates whose join
    fan-out compounds every round. 15k spokes → one hub forces the
    split."""
    n = 15_000
    df = spark.range(n).selectExpr(
        "concat('s', id) AS src", "'hub' AS dst"
    )
    out = hyperball_harmonic(df.repartition(2), b=10, max_iter=3)
    rows = out.collect()
    assert len(rows) == n + 1                      # one row per node
    hub = {r["node"]: r["harmonic_est"] for r in rows}["hub"]
    # every spoke is at distance 1 → harmonic(hub) ≈ n within HLL error
    assert hub == pytest.approx(n, rel=0.06)


def test_hyperball_random_graph_error_bound(spark):
    """200-node hash-random graph: per-node relative error within the
    sketch regime (linear counting at this scale → a few %)."""
    rng = np.random.default_rng(7)
    n, m = 200, 1200
    edges = [
        (f"n{int(a)}", f"n{int(b)}")
        for a, b in zip(rng.integers(0, n, m), rng.integers(0, n, m))
        if a != b
    ]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    exact = {
        r["node"]: r["harmonic"]
        for r in harmonic_centrality_exact(df).collect()
    }
    est = {
        r["node"]: r["harmonic_est"] for r in hyperball_harmonic(df).collect()
    }
    assert set(est) == set(exact)
    rel = [
        abs(est[k] - exact[k]) / exact[k] for k in exact if exact[k] > 0
    ]
    assert np.mean(rel) < 0.03
    assert np.max(rel) < 0.10
    # ranking utility: top-10 exact hosts vs estimated top-10 overlap
    top_exact = set(sorted(exact, key=exact.get, reverse=True)[:10])
    top_est = set(sorted(est, key=est.get, reverse=True)[:10])
    assert len(top_exact & top_est) >= 8


def test_hyperball_partitioning_invariant(spark):
    """r7 internals: the previous round's rows ride the merge union
    (flagged, extracted positionally after the kernel sort) and the
    loop stops on an accumulator — the result must be bit-identical
    across input partitionings and repeated invocations (register max
    and the estimate are order-insensitive; exactly one prev row per
    node exists in every layout)."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}") for i in range(120)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    runs = []
    for parts in (1, 3, 16):
        runs.append(
            sorted(
                (r["node"], r["harmonic_est"])
                for r in hyperball_harmonic(
                    df.repartition(parts), b=8
                ).collect()
            )
        )
    assert runs[0] == runs[1] == runs[2]
