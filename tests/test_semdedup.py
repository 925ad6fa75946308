"""SemDeDup (Abbas 2023): cluster-scoped cosine pairs vs a brute-force
python replay, transitive group/survivor semantics, the paper's
farthest-from-centroid keep policy, IVF cell assignment, and the
cell-size guard."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.dedup import (
    semdedup,
    semdedup_centroid_cos,
    semdedup_ivf_cells,
    semdedup_pairs,
    semdedup_sign_cells,
)


def _emb_df(spark, mat, ids=None, parts=4):
    ids = ids if ids is not None else range(len(mat))
    rows = [(int(i), [float(x) for x in v]) for i, v in zip(ids, mat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(parts)


def _ref_pairs(mat, ids, cells, threshold):
    m = np.asarray(mat, dtype=np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = set()
    for c in set(cells):
        idx = [i for i, cc in enumerate(cells) if cc == c]
        sims = m[idx] @ m[idx].T
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                if sims[a, b] >= threshold:
                    out.add((min(ids[idx[a]], ids[idx[b]]),
                             max(ids[idx[a]], ids[idx[b]])))
    return out


def _ref_groups(ids, pairs):
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), []).append(i)
    out = {}
    for members in comp.values():
        g = min(members)
        for i in members:
            out[i] = (g, len(members), i == g)
    return out


def test_pairs_match_bruteforce(spark):
    rng = np.random.default_rng(3)
    mat = rng.normal(size=(120, 8))
    # plant clones so pairs exist at a high threshold
    mat[50] = mat[10] * 1.7
    mat[51] = mat[10] + rng.normal(scale=0.01, size=8)
    df = semdedup_sign_cells(_emb_df(spark, mat), n_bits=2)
    cells = [
        sum((1 << i) * (mat[r][i] >= 0) for i in range(2))
        for r in range(len(mat))
    ]
    got = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(df, threshold=0.8).collect()
    }
    assert got == _ref_pairs(mat, list(range(len(mat))), cells, 0.8)
    assert len(got) >= 2  # the planted clones actually showed up


def test_groups_and_min_id_survivor(spark):
    rng = np.random.default_rng(5)
    mat = rng.normal(size=(60, 6))
    # chain A~B, B~C inside one cell: all three must fold into ONE group
    base = np.abs(rng.normal(size=6)) + 0.5  # all-positive → cell 3 (bits 0,1)
    mat[20] = base
    mat[21] = base + 0.001
    mat[22] = mat[21] * 2.0
    df = semdedup_sign_cells(_emb_df(spark, mat), n_bits=2)
    cells = [
        sum((1 << i) * (mat[r][i] >= 0) for i in range(2))
        for r in range(len(mat))
    ]
    ids = list(range(len(mat)))
    ref = _ref_groups(ids, _ref_pairs(mat, ids, cells, 0.9))
    got = {
        r.vec_id: (r.group_id, r.group_size, r.keep)
        for r in semdedup(df, threshold=0.9).collect()
    }
    assert got == ref
    assert got[20] == (20, 3, True) and not got[21][2] and not got[22][2]


def test_centroid_far_keeps_marginal_member(spark):
    # one cell: a tight trio where member 2 sits farther from the cell
    # centroid (the cell also holds an unrelated far vector pulling the
    # mean) — paper policy keeps the farthest member, not the min id.
    v = np.array([1.0, 0.2, 0.1, 0.0])
    mat = np.stack([
        v, v + [0.0, 0.01, 0.0, 0.0], v + [0.0, 0.3, 0.25, 0.0],
        [0.5, -0.9, 0.9, 0.9],
    ])
    df = _emb_df(spark, mat).withColumn("cell", F.lit(0))
    cos = {r.vec_id: r.cent_cos for r in semdedup_centroid_cos(df).collect()}
    trio_far = min((cos[i], i) for i in (0, 1, 2))[1]
    got = {r.vec_id: (r.group_id, r.keep)
           for r in semdedup(df, threshold=0.94, keep="centroid_far").collect()}
    # trio is one group; survivor is the farthest-from-centroid member
    assert got[0][0] == got[1][0] == got[2][0] == 0
    assert [i for i in (0, 1, 2) if got[i][1]] == [trio_far]
    assert trio_far == 2  # by construction
    assert got[3] == (3, True)  # singleton keeps


def test_ivf_cells_match_numpy(spark):
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(80, 8))
    cent = rng.normal(size=(5, 8))
    got = {
        r.vec_id: r.cell
        for r in semdedup_ivf_cells(_emb_df(spark, mat), cent).collect()
    }
    m = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    c = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    ref = (m @ c.T).argmax(axis=1)
    assert got == {i: int(ref[i]) for i in range(len(mat))}


def test_cell_size_guard(spark):
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(30, 4))
    df = _emb_df(spark, mat).withColumn("cell", F.lit(0))
    with pytest.raises(Exception, match="max_cell_rows"):
        semdedup_pairs(df, threshold=0.9, max_cell_rows=10).collect()
