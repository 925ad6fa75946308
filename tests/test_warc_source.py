"""WARC source: framing, gzip member layouts, HTTP parse, chunked
bodies, truncation tolerance, and composition with html_extract."""

import gzip

import pytest
from pyspark.sql import functions as F

from bloomine_spark.sources.warc import (
    build_warc,
    iter_warc_records,
    parse_http_payload,
    read_warc,
    warc_record_bytes,
)


def _http(body: bytes, status: int = 200, ctype: str = "text/html",
          chunked: bool = False) -> bytes:
    if chunked:
        wire = b""
        for i in range(0, len(body), 7):
            c = body[i : i + 7]
            wire += hex(len(c))[2:].encode() + b"\r\n" + c + b"\r\n"
        wire += b"0\r\n\r\n"
        return (
            f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
            "Transfer-Encoding: chunked\r\n\r\n".encode() + wire
        )
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n".encode() + body
    )


def _fixture_records():
    info = warc_record_bytes(
        "warcinfo", b"software: test\r\n", "<urn:uuid:0>",
        content_type="application/warc-fields",
    )
    r1 = warc_record_bytes(
        "response", _http(b"<html><p>alpha beta</p></html>"),
        "<urn:uuid:1>", target_uri="https://a.com/x",
    )
    r2 = warc_record_bytes(
        "response", _http(b"<p>gamma chunked delta body</p>", chunked=True),
        "<urn:uuid:2>", target_uri="https://b.com/y",
    )
    req = warc_record_bytes(
        "request", b"GET /x HTTP/1.1\r\nHost: a.com\r\n\r\n",
        "<urn:uuid:3>", target_uri="https://a.com/x",
        content_type="application/http; msgtype=request",
    )
    return [info, r1, r2, req]


def test_iter_warc_records_framing():
    data = build_warc(_fixture_records())
    recs = list(iter_warc_records(data))
    assert [h[b"warc-type"] for h, _ in recs] == [
        b"warcinfo", b"response", b"response", b"request",
    ]
    # payload boundaries exact: the response payload starts at HTTP/
    assert recs[1][1].startswith(b"HTTP/1.1 200")


def test_iter_warc_truncated_tail_dropped():
    data = build_warc(_fixture_records())
    assert len(list(iter_warc_records(data[:-30]))) == 3


def test_parse_http_chunked():
    status, ctype, body = parse_http_payload(
        _http(b"hello chunked world 123", chunked=True)
    )
    assert (status, ctype) == (200, "text/html")
    assert body == b"hello chunked world 123"


@pytest.mark.parametrize("layout", ["plain", "whole_gz", "member_gz"])
def test_read_warc_spark(spark, tmp_path, layout):
    recs = _fixture_records()
    if layout == "plain":
        (tmp_path / "seg-00000.warc").write_bytes(build_warc(recs))
    elif layout == "whole_gz":
        (tmp_path / "seg-00000.warc.gz").write_bytes(
            gzip.compress(build_warc(recs))
        )
    else:  # CommonCrawl member-per-record layout
        (tmp_path / "seg-00000.warc.gz").write_bytes(
            build_warc(recs, per_record_gzip=True)
        )
    df = read_warc(spark, str(tmp_path / "*.warc*"))
    rows = sorted(df.collect(), key=lambda r: r["record_id"])
    assert [r["warc_type"] for r in rows] == ["response", "response"]
    assert rows[0]["target_uri"] == "https://a.com/x"
    assert rows[0]["http_status"] == 200
    assert rows[0]["http_content_type"] == "text/html"
    assert bytes(rows[0]["payload"]) == b"<html><p>alpha beta</p></html>"
    assert bytes(rows[1]["payload"]) == b"<p>gamma chunked delta body</p>"
    assert rows[0]["source"] == "seg-00000"


def test_read_warc_all_types(spark, tmp_path):
    (tmp_path / "s.warc").write_bytes(build_warc(_fixture_records()))
    df = read_warc(spark, str(tmp_path / "s.warc"), types=())
    assert df.count() == 4


def test_run_curate_cli_from_warc(spark, tmp_path):
    """Raw crawl → curated parquet in one CLI run: WARC responses →
    URL canonicalize+filter → boilerplate-tiered extraction → scrub →
    score → filter → dedup."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    good = ("the quick brown fox jumps over a lazy dog and then the fox "
            "runs far away of the meadow and keeps going past the old "
            "barn until the night comes and a quiet wind settles")
    nav = '<div><a href="/">Home</a> | <a href="/a">About</a></div>'

    def page(body):
        return f"{nav}<p>{body}</p>".encode()

    recs = [
        warc_record_bytes("warcinfo", b"software: t\r\n", "<urn:uuid:0>",
                          content_type="application/warc-fields"),
        warc_record_bytes("response", _http(page(good)), "<urn:uuid:1>",
                          target_uri="https://a.com/one"),
        warc_record_bytes("response",
                          _http(page(good.replace("fox", "hare"))),
                          "<urn:uuid:2>", target_uri="https://a.com/two"),
        # exact duplicate content at a different URL → dedup drops it
        warc_record_bytes("response", _http(page(good)), "<urn:uuid:3>",
                          target_uri="https://b.com/copy"),
        # non-document URL → url_filter drops it before extraction
        warc_record_bytes("response", _http(page("img alt text page")),
                          "<urn:uuid:4>", target_uri="https://a.com/p.jpg"),
        # non-HTML content type → dropped at the response filter
        warc_record_bytes("response", _http(b"{}", ctype="application/json"),
                          "<urn:uuid:5>", target_uri="https://a.com/api"),
    ]
    (tmp_path / "seg-0.warc.gz").write_bytes(
        build_warc(recs, per_record_gzip=True)
    )
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(repo, "jobs", "run_curate.py"),
        "--input", str(tmp_path / "*.warc.gz"), "--input-format", "warc",
        "--output", out, "--run-id", "w0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
    ]
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    cur = spark.read.parquet(f"{out}/w0/curated").toPandas()
    ids = set(cur["doc_id"])
    assert ids == {"<urn:uuid:1>", "<urn:uuid:2>"}
    row = cur[cur["doc_id"] == "<urn:uuid:1>"].iloc[0]
    assert row["text"].startswith("the quick brown fox")
    assert "Home" not in row["text"]          # nav bar cut by link density
    assert row["url_canon"] == "https://a.com/one"


def test_warc_to_html_extract_pipeline(spark, tmp_path):
    """The full front door: WARC bytes → responses → decoded text →
    html_extract — the C4/CCNet stage-zero pipeline end to end."""
    from bloomine_spark.operators.webops import html_extract

    (tmp_path / "s.warc.gz").write_bytes(
        build_warc(_fixture_records(), per_record_gzip=True)
    )
    docs = (
        read_warc(spark, str(tmp_path / "*.warc.gz"))
        .filter(F.col("http_content_type").startswith("text/html"))
        .select(
            F.col("record_id").alias("doc_id"),
            F.decode(F.col("payload"), "UTF-8").alias("html"),
        )
    )
    out = {r["doc_id"]: r["text"] for r in html_extract(docs).collect()}
    assert out["<urn:uuid:1>"] == "alpha beta"
    assert out["<urn:uuid:2>"] == "gamma chunked delta body"
