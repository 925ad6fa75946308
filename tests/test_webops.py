"""Web front-end operators: HTML→text extraction, URL canonicalization,
URL filtering, URL dedup + host caps."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.webops import (
    canonicalize_url_df,
    html_extract,
    html_extract_main,
    html_meta,
    url_dedup_with_host_cap,
    url_filter,
)


def _extract_one(spark, html):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "html": [html]}))
    return html_extract(df).collect()[0]


def test_html_extract_kills_noncontent_and_structures(spark):
    html = (
        "<html><head><title>nope</title><style>p{color:red}</style></head>"
        "<body><h1>Title</h1><p>First para.</p>"
        "<script type='text/js'>var x = '<p>fake</p>';</script>"
        "<div>Second <b>bold</b> para.</div>"
        "<!-- hidden comment --><ul><li>item one</li><li>item two</li></ul>"
        "</body></html>"
    )
    r = _extract_one(spark, html)
    lines = r["text"].split("\n")
    assert lines == [
        "Title",
        "First para.",
        "Second bold para.",
        "item one",
        "item two",
    ]
    assert r["n_lines"] == 5
    assert "fake" not in r["text"] and "nope" not in r["text"]
    assert "color" not in r["text"] and "hidden" not in r["text"]


def test_html_extract_entities_single_level(spark):
    r = _extract_one(
        spark, "<p>A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; "
        "x&nbsp;y &amp;lt;literal</p>"
    )
    assert r["text"] == "A & B <tag> \"q\" 's' x y &lt;literal"


def test_html_extract_plain_text_passthrough(spark):
    r = _extract_one(spark, "just   plain\t text\n\n\nwith gaps")
    assert r["text"] == "just plain text\nwith gaps"
    assert r["n_lines"] == 2


def test_html_extract_empty(spark):
    r = _extract_one(spark, "<script>only(code)</script>")
    assert r["text"] == "" and r["n_lines"] == 0


def _canon(spark, urls):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(urls)), "url": urls})
    )
    out = canonicalize_url_df(df).toPandas()
    return dict(zip(out["doc_id"], out["url_canon"]))


def test_canonicalize_url(spark):
    got = _canon(
        spark,
        [
            "HTTPS://WWW.Example.COM:443/Path/Q?a=1#frag",
            "http://example.com:80",
            "http://example.com:8080/x",
            "https://site.org/p?utm_source=tw&q=1&fbclid=zz&keep=2",
            "https://site.org/p?utm_campaign=x",
            "https://site.org/p?gclid=1&utm_medium=2",
        ],
    )
    assert got[0] == "https://example.com/Path/Q?a=1"
    assert got[1] == "http://example.com/"
    assert got[2] == "http://example.com:8080/x"   # non-default port kept
    assert got[3] == "https://site.org/p?q=1&keep=2"
    assert got[4] == "https://site.org/p"
    assert got[5] == "https://site.org/p"


def test_url_filter_first_failing_reason(spark):
    urls = [
        "https://ok.example.com/a/b",                       # keep
        "ftp://files.example.com/x",                        # scheme
        "https://cdn.example.com/logo.png",                 # extension
        "https://ads.tracker.net/p",                        # blocked_host
        "https://deep.example.com/" + "a/" * 20 + "end",    # path_depth
        "https://cdn.tracker.net/x.gif",                    # extension wins
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(urls)), "url_canon": urls})
    )
    out = url_filter(df, blocked_hosts=["tracker.net"]).toPandas()
    got = dict(zip(out["doc_id"], out["url_reason"]))
    assert got[0] is None and out[out.doc_id == 0]["url_keep"].iloc[0]
    assert got[1] == "scheme"
    assert got[2] == "extension"
    assert got[3] == "blocked_host"
    assert got[4] == "path_depth"
    assert got[5] == "extension"  # rule order: extension before host


def test_url_dedup_and_host_cap(spark):
    rows = [
        {"doc_id": 1, "url_canon": "https://a.com/x"},
        {"doc_id": 5, "url_canon": "https://a.com/x"},   # dup, loses
        {"doc_id": 2, "url_canon": "https://a.com/y"},
        {"doc_id": 3, "url_canon": "https://b.com/1"},
        {"doc_id": 4, "url_canon": "https://b.com/2"},
        {"doc_id": 6, "url_canon": "https://b.com/3"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = url_dedup_with_host_cap(df, max_per_host=2).toPandas()
    by_id = out.set_index("doc_id")
    assert bool(by_id.loc[1, "keep"]) and not bool(by_id.loc[5, "keep"])
    assert int(by_id.loc[5, "url_rank"]) == 2
    # host b.com has 3 distinct docs, cap 2 → exactly 2 kept, chosen by
    # md5 rank (deterministic), min-id NOT guaranteed
    b_kept = out[(out["doc_id"].isin([3, 4, 6])) & out["keep"]]
    assert len(b_kept) == 2
    # a.com: doc 2 and the url-dedup survivor 1 both kept (cap 2 holds)
    assert bool(by_id.loc[2, "keep"])


def test_html_extract_main_drops_link_dense_lines(spark):
    html = (
        '<div><a href="/">Home</a> | <a href="/a">About</a> | '
        '<a href="/c">Contact us</a></div>'
        "<p>Real content with an inline <a href='/x'>link</a> that stays.</p>"
        "<div>No anchors here at all.</div>"
        '<div><a href="/next">Next page</a></div>'
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "html": [html]}))
    r = html_extract_main(df).collect()[0]
    assert r["text"].split("\n") == [
        "Real content with an inline link that stays.",
        "No anchors here at all.",
    ]
    assert r["n_boilerplate_lines"] == 2
    assert r["n_lines"] == 2
    # the plain extractor keeps everything — the tier is additive
    plain = html_extract(df).collect()[0]
    assert plain["n_lines"] == 4


def test_html_extract_main_density_boundary(spark):
    # tags become spaces, so visible text is "12345 6789" (10 chars) and
    # anchor text "12345" (5) — EXACTLY half → not boilerplate (strict >)
    html = "<p><a href='/x'>12345</a>6789</p>"
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "html": [html]}))
    r = html_extract_main(df, max_link_density=0.5).collect()[0]
    assert r["text"] == "12345 6789"
    assert r["n_boilerplate_lines"] == 0
    # one char less of plain text tips it over the boundary → dropped
    html2 = "<p><a href='/x'>12345</a>678</p>"
    df2 = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "html": [html2]}))
    r2 = html_extract_main(df2, max_link_density=0.5).collect()[0]
    assert r2["text"] == "" and r2["n_boilerplate_lines"] == 1


def test_html_extract_main_matches_plain_when_no_anchors(spark):
    html = "<html><body><h1>T</h1><p>alpha beta</p><ul><li>g</li></ul></body></html>"
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "html": [html]}))
    a = html_extract_main(df).collect()[0]
    b = html_extract(df).collect()[0]
    assert a["text"] == b["text"] and a["n_lines"] == b["n_lines"]
    assert a["n_boilerplate_lines"] == 0


def test_html_meta_fields(spark):
    html = (
        "<html><head><title> A &amp; B \n site </title>"
        '<meta name="description" content="Best  docs &#39;here&#39;">'
        "<link rel='canonical' href='https://a.com/real'>"
        '<meta property="og:title" content="OG name">'
        "<title>second ignored</title></head><body>x</body></html>"
    )
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "html": [html]}))
    r = html_meta(df).collect()[0]
    assert r["title"] == "A & B site"         # entity + whitespace fold
    assert r["description"] == "Best docs 'here'"
    assert r["canonical_url"] == "https://a.com/real"
    assert r["og_title"] == "OG name"


def test_html_meta_missing_fields_null(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "html": ["<p>no head</p>"]})
    )
    r = html_meta(df).collect()[0]
    assert r["title"] is None and r["description"] is None
    assert r["canonical_url"] is None and r["og_title"] is None


def test_host_cap_spent_on_survivors_not_duplicates(spark):
    """Duplicate rows of one hot URL must not crowd distinct survivors
    out of the host quota: survivors rank first in the host window."""
    rows = [{"doc_id": i, "url_canon": "https://h.com/hot"} for i in range(50)]
    rows += [
        {"doc_id": 100, "url_canon": "https://h.com/a"},
        {"doc_id": 101, "url_canon": "https://h.com/b"},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    out = url_dedup_with_host_cap(df, max_per_host=3).toPandas()
    kept = set(out[out["keep"]]["doc_id"])
    # survivors: doc 0 (min-id of the hot URL), 100, 101 — exactly the
    # three distinct URLs; 49 duplicate rows never touch the quota
    assert kept == {0, 100, 101}


def test_sitemap_entries(spark):
    from bloomine_spark.operators.webops import sitemap_entries

    urlset = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/'
        'schemas/sitemap/0.9"><url><loc> https://a.com/1 </loc>'
        "<lastmod>2024-01-02</lastmod></url>"
        "<url><loc>https://a.com/2</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url></urlset>"  # no loc → drop
    )
    index = (
        "<sitemapindex><sitemap><loc>https://a.com/s1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "xml": [urlset, index]})
    )
    out = sitemap_entries(df).toPandas().sort_values(["doc_id", "loc"])
    got = list(map(tuple, out[["doc_id", "loc", "lastmod", "is_index"]].values))
    assert got == [
        (1, "https://a.com/1", "2024-01-02", False),
        (1, "https://a.com/2", None, False),
        (2, "https://a.com/s1.xml", None, True),
    ]


def test_url_frontier_stream(spark, tmp_path):
    """Streaming frontier: canonical dedup suppresses re-discovered
    URLs ACROSS triggers; filter-failing URLs never reach state."""
    import datetime

    from bloomine_spark.streaming.stream_ops import url_frontier_stream

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    for i in range(8):
        # four distinct pages, each discovered twice (tracking params /
        # fragments vary so only CANONICAL equality can catch the dup),
        # plus one .jpg that must die at the filter
        rows.append(
            {
                "doc_id": i,
                "url": f"https://WWW.Site.com/p{i % 4}"
                + ("?utm_source=x" if i >= 4 else "#top"),
                "ts": t0 + datetime.timedelta(seconds=i),
            }
        )
    rows.append(
        {"doc_id": 99, "url": "https://site.com/x.jpg",
         "ts": t0 + datetime.timedelta(seconds=9)}
    )
    src = str(tmp_path / "fsrc")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        url_frontier_stream(stream, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("frontier_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "fck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.sql("select * from frontier_out").toPandas()
    assert sorted(out["url_canon"]) == [
        f"https://site.com/p{i}" for i in range(4)
    ]
    assert 99 not in set(out["doc_id"])  # extension-filtered before state


def test_webops_plans_are_codegen(spark):
    """Extraction and canonicalization are zero-exchange Python-free
    maps; dedup+cap is rank windows only."""
    from bloomine_spark.plans.audit import plan_facts

    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "html": ["<p>x</p>"],
                      "url": ["https://a.com/"]})
    )
    fe = plan_facts(html_extract(df))
    assert not fe.has_python_eval and fe.n_exchanges == 0
    fc = plan_facts(canonicalize_url_df(df))
    assert not fc.has_python_eval and fc.n_exchanges == 0
