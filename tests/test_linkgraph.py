"""Link extraction, host graph, and PageRank."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.linkgraph import (
    extract_links,
    host_edges,
    pagerank,
)


def _links(spark, html, url="https://site.com/dir/page"):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "url": [url], "html": [html]})
    )
    out = extract_links(df).toPandas()
    return list(out["link"])


def test_extract_links_resolution(spark):
    html = (
        '<p><a href="HTTPS://Other.com/A/b?q=1">abs</a>'
        "<a href='//cdn.Example.com/x.js'>proto-rel</a>"
        '<a class="z" href="/root/path#frag">root-rel</a>'
        '<a href="mailto:a@b.c">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="sibling.html">dir-rel dropped</a>'
        '<a href="https://dup.com/">one</a></p>'
    )
    got = _links(spark, html)
    assert got == [
        "https://other.com/A/b?q=1",   # scheme+host lowered, path case kept
        "https://cdn.example.com/x.js",  # page scheme adopted
        "https://site.com/root/path",    # root-relative + fragment cut
        "https://dup.com/",
    ]


def test_extract_links_quote_styles_and_case(spark):
    got = _links(
        spark,
        "<A HREF='https://a.com/1'>x</A><a data-x=1 href=\"https://b.com/2\">y</a>",
    )
    assert got == ["https://a.com/1", "https://b.com/2"]


def test_host_edges_distinct_no_self_loop(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "url": ["https://a.com/p1", "https://a.com/p2", "https://b.com/"],
                "link": ["https://b.com/x", "https://b.com/y", "https://b.com/z"],
            }
        )
    )
    got = {
        (r["src"], r["dst"]) for r in host_edges(df).collect()
    }
    assert got == {("a.com", "b.com")}  # dedup + self-loop dropped


def _ref_pagerank(edges, damping, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        share = np.where(out > 0, r / np.maximum(out, 1), 0.0)
        for s, d in edges:
            contrib[idx[d]] += share[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(nodes, r))


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "c"),            # d has no in-links
    ("c", "e"),            # e is dangling (no out-edges)
]


def test_pagerank_matches_power_iteration(spark):
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    got = {r["node"]: r["pr"] for r in pagerank(df, iterations=15).collect()}
    want = _ref_pagerank(EDGES, 0.85, 15)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # dangling mass is redistributed, so total mass is conserved
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)


def test_pagerank_uniform_on_cycle(spark):
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(pd.DataFrame(cyc, columns=["src", "dst"]))
    got = [r["pr"] for r in pagerank(df, iterations=5).collect()]
    assert got == pytest.approx([1 / 3] * 3, abs=1e-12)


def test_pagerank_tol_early_stop(spark):
    cyc = [("x", "y"), ("y", "z"), ("z", "x")]
    df = spark.createDataFrame(pd.DataFrame(cyc, columns=["src", "dst"]))
    stats = {}
    pagerank(df, iterations=50, tol=1e-9, stats=stats)
    # the cycle is at the fixpoint immediately — delta hits 0 on round 1
    assert stats["rounds"] < 5


def _ref_personalized(edges, weights, damping, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    w = np.array([weights.get(v, 0.0) for v in nodes])
    w = w / w.sum()
    r = w.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        share = np.where(out > 0, r / np.maximum(out, 1), 0.0)
        for s, d in edges:
            contrib[idx[d]] += share[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - damping) * w + damping * (contrib + dangling * w)
    return dict(zip(nodes, r))


def test_trustrank_personalized_reset(spark):
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    seeds = spark.createDataFrame(
        pd.DataFrame({"node": ["a"], "weight": [1.0]})
    )
    got = {
        r["node"]: r["pr"]
        for r in pagerank(df, iterations=12, reset=seeds).collect()
    }
    want = _ref_personalized(EDGES, {"a": 1.0}, 0.85, 12)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-12)
    # trust flows from the seed: a outranks the structurally similar b
    assert got["a"] > got["b"]
    # e is reachable from the seed only via c — nonzero but small
    assert 0 < got["e"] < got["c"]


def test_uniform_reset_equals_default(spark):
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    nodes = sorted({s for s, _ in EDGES} | {d for _, d in EDGES})
    uni = spark.createDataFrame(
        pd.DataFrame({"node": nodes, "weight": [3.0] * len(nodes)})
    )
    a = {r["node"]: r["pr"] for r in pagerank(df, iterations=6).collect()}
    b = {r["node"]: r["pr"]
         for r in pagerank(df, iterations=6, reset=uni).collect()}
    for k in a:
        assert b[k] == pytest.approx(a[k], abs=1e-12)


def test_reset_weight_validation(spark):
    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    zero = spark.createDataFrame(
        pd.DataFrame({"node": ["a"], "weight": [0.0]})
    )
    with pytest.raises(ValueError, match="positive"):
        pagerank(df, iterations=2, reset=zero)


def test_pagerank_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({"src": [], "dst": []}), "src string, dst string")
    assert pagerank(df, iterations=3).count() == 0


def test_linkgraph_plans(spark):
    """extract_links is a zero-exchange codegen map+explode; host_edges
    has exactly the one distinct exchange."""
    df = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [1], "url": ["https://a.com/"], "html": ["<a href='/x'>y</a>"]}
        )
    )
    links = extract_links(df)
    plan = links._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan
    eplan = (
        host_edges(links)._jdf.queryExecution().executedPlan().toString()
    ).split("== Initial Plan ==")[0]
    assert eplan.count("Exchange") <= 2  # partial+final hash agg of distinct
    assert "CartesianProduct" not in eplan


def _ref_hits(edges, iters):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.full(n, 1.0 / np.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in edges:
            a[idx[d]] += h[idx[s]]
        a /= np.sqrt((a * a).sum())
        h = np.zeros(n)
        for s, d in edges:
            h[idx[s]] += a[idx[d]]
        h /= np.sqrt((h * h).sum())
    return {v: (h[idx[v]], a[idx[v]]) for v in nodes}


def test_hits_matches_power_iteration(spark):
    from bloomine_spark.operators.linkgraph import hits

    df = spark.createDataFrame(pd.DataFrame(EDGES, columns=["src", "dst"]))
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iterations=10).collect()}
    want = _ref_hits(EDGES, 10)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-12)
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)
    # both vectors stay L2-normalized
    assert sum(v[0] ** 2 for v in got.values()) == pytest.approx(1.0, abs=1e-12)
    assert sum(v[1] ** 2 for v in got.values()) == pytest.approx(1.0, abs=1e-12)
    # e is dangling (pure authority): hub 0; d has no in-links: auth 0
    assert got["e"][0] == 0.0
    assert got["d"][1] == 0.0


def test_hits_bipartite_roles(spark):
    from bloomine_spark.operators.linkgraph import hits

    # hubs h1,h2 point at authorities a1,a2 — roles must separate fully
    edges = [("h1", "a1"), ("h1", "a2"), ("h2", "a1"), ("h2", "a2")]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = {r["node"]: (r["hub"], r["auth"]) for r in hits(df, iterations=5).collect()}
    for n in ("h1", "h2"):
        assert got[n][0] == pytest.approx(1 / np.sqrt(2), abs=1e-12)
        assert got[n][1] == 0.0
    for n in ("a1", "a2"):
        assert got[n][0] == 0.0
        assert got[n][1] == pytest.approx(1 / np.sqrt(2), abs=1e-12)


def test_hits_empty(spark):
    from bloomine_spark.operators.linkgraph import hits

    df = spark.createDataFrame(pd.DataFrame(columns=["src", "dst"]), "src string, dst string")
    assert hits(df).count() == 0


def test_hits_empty_preserves_node_type(spark):
    # review finding: the empty-graph schema derives from the input
    df = spark.createDataFrame(pd.DataFrame(columns=["src", "dst"]),
                               "src long, dst long")
    out = hits_schema = __import__("bloomine_spark.operators.linkgraph",
                                   fromlist=["hits"]).hits(df)
    assert out.count() == 0
    assert dict(out.dtypes)["node"] == "bigint"
