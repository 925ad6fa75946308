"""Connected-components group resolution (pair → cluster → survivor).

Reference behavior: BlooMine's polyfamily binning assigns each read to one
probe bin (bloomine/polyfamily.py); at corpus scale the analogous step is
resolving the near-dup PAIR graph into clusters and keeping one canonical
doc per cluster. The component labels are checked against a driver-side
union-find oracle on random graphs; convergence is pinned on the
worst-case path graph.
"""

import random

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.dedup import (
    connected_components,
    dedup_groups,
)


def _union_find_components(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # label every node by its component MINIMUM (matches the operator)
    comp_min = {}
    for v in range(n_nodes):
        r = find(v)
        comp_min[r] = min(comp_min.get(r, v), v)
    return {v: comp_min[find(v)] for v in range(n_nodes)}


def _cc_dict(spark, edges):
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    return {
        r["id"]: r["component"]
        for r in connected_components(df).collect()
    }


def test_cc_matches_union_find_random_graphs(spark):
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(90)
        ]
        edges = [e for e in edges if e[0] != e[1]]
        got = _cc_dict(spark, edges)
        want = _union_find_components(n, edges)
        touched = {v for e in edges for v in e}
        assert got == {v: want[v] for v in touched}


def test_cc_path_graph_converges_logarithmically(spark):
    # a 200-node path is the diameter worst case; the alternating
    # large-star/small-star algorithm must collapse it in O(log n) rounds
    # (min-label propagation would need ~200)
    edges = [(i, i + 1) for i in range(199)]
    df = spark.createDataFrame(edges, "id_a: long, id_b: long")
    stats = {}
    got = {
        r["id"]: r["component"]
        for r in connected_components(df, stats=stats).collect()
    }
    assert got == {v: 0 for v in range(200)}
    assert stats["rounds"] <= 12, stats


def test_cc_two_components_and_isolated_nodes(spark):
    edges = [(5, 9), (9, 7), (20, 21)]
    got = _cc_dict(spark, edges)
    assert got == {5: 5, 9: 5, 7: 5, 20: 20, 21: 20}
    # isolated nodes (never in a pair) are absent from cc output —
    # dedup_groups is what restores them as singletons


def test_cc_empty_pairs(spark):
    df = spark.createDataFrame([], "id_a: long, id_b: long")
    assert connected_components(df).count() == 0


def test_dedup_groups_min_id_survivor(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id: long, text: string"
    )
    # components {1,2,3} (chained pairs) and {5,6}; 0,4,7 singletons
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a: long, id_b: long"
    )
    rows = {
        r["doc_id"]: r for r in dedup_groups(docs, pairs).collect()
    }
    assert len(rows) == 8
    assert [rows[i]["group_id"] for i in range(8)] == [0, 1, 1, 1, 4, 5, 5, 7]
    assert [rows[i]["group_size"] for i in range(8)] == [1, 3, 3, 3, 1, 2, 2, 1]
    # min-id survivor: doc 1 keeps, 2/3 drop; doc 5 keeps, 6 drops
    assert [rows[i]["keep"] for i in range(8)] == [
        True, True, False, False, True, True, False, True,
    ]


def test_dedup_groups_quality_survivor(spark):
    docs = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5)],
        "doc_id: long, quality: double",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a: long, id_b: long"
    )
    rows = {
        r["doc_id"]: r
        for r in dedup_groups(docs, pairs, quality_col="quality").collect()
    }
    # max quality wins; tie (2 vs 3 at 0.9) broken by min id → 2 keeps
    assert rows[2]["keep"] and not rows[1]["keep"] and not rows[3]["keep"]
    assert rows[4]["keep"] and rows[4]["group_size"] == 1


def test_dedup_groups_drop_fraction_consistent(spark):
    # every group keeps EXACTLY one member regardless of shape
    rng = random.Random(7)
    docs = spark.createDataFrame(
        [(i,) for i in range(60)], "doc_id: long"
    )
    pairs = spark.createDataFrame(
        [(rng.randrange(60), rng.randrange(60)) for _ in range(40)],
        "id_a: long, id_b: long",
    ).filter("id_a <> id_b")
    out = dedup_groups(docs, pairs)
    per_group = (
        out.groupBy("group_id")
        .agg(
            F.sum(F.col("keep").cast("int")).alias("kept"),
            F.count("*").alias("n"),
            F.max("group_size").alias("sz"),
        )
        .collect()
    )
    for r in per_group:
        assert r["kept"] == 1
        assert r["n"] == r["sz"]


def test_cc_string_ids(spark):
    # doc ids are strings in plenty of corpora; min-label must follow
    # lexicographic order there
    pairs = spark.createDataFrame(
        [("b", "c"), ("c", "a"), ("x", "y")], "id_a: string, id_b: string"
    )
    got = _cc_dict(spark, [])
    got = {
        r["id"]: r["component"] for r in connected_components(pairs).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}


# ---------------------------------------------------------------------------
# SoftDeDup reweighting (He et al. 2024)
# ---------------------------------------------------------------------------

def _soft(spark, n_docs, edges):
    from bloomine_spark.operators.dedup import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i,) for i in range(n_docs)], "doc_id: long"
    )
    pairs = spark.createDataFrame(edges, "id_a: long, id_b: long")
    return {
        r["doc_id"]: (r["commonness"], r["weight"])
        for r in soft_dedup_weights(docs, pairs).collect()
    }


def test_soft_dedup_no_pairs_is_uniform(spark):
    got = _soft(spark, 5, [])
    assert got == {i: (1, 1.0) for i in range(5)}


def test_soft_dedup_triangle_weights(spark):
    # docs 0-1-2 form one group of 3; docs 3..9 are singletons.
    # N = 10, G = 8 groups -> singleton weight 10/8, member (10/8)/3.
    got = _soft(spark, 10, [(0, 1), (1, 2)])
    for i in (0, 1, 2):
        assert got[i][0] == 3
        assert got[i][1] == pytest.approx((10 / 8) / 3)
    for i in range(3, 10):
        assert got[i] == (1, 10 / 8)


def test_soft_dedup_mass_conserved(spark):
    random_edges = [(0, 1), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8)]
    got = _soft(spark, 20, random_edges)
    assert sum(w for _, w in got.values()) == pytest.approx(20.0)
    # commonness matches the union-find component sizes
    want = _union_find_components(20, random_edges)
    sizes = {}
    for v, c in want.items():
        sizes[c] = sizes.get(c, 0) + 1
    for v, (c, _) in got.items():
        assert c == sizes[want[v]]
