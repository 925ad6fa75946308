"""robots.txt parsing + RFC 9309 evaluation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.robots import robots_allowed, robots_rules

ROBOTS_A = """# crawl policy
User-agent: trainbot
Disallow: /private/
Allow: /private/ok/

User-agent: *
Disallow: /
"""

ROBOTS_B = """User-agent: alpha
User-agent: beta
Disallow: /shared/

User-agent: *
Disallow: /tmp/*.log
Allow: /tmp/
Disallow: /exact$
Disallow:
"""


def _rules(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {"host": ["a.com", "b.com"], "robots_txt": [ROBOTS_A, ROBOTS_B]}
        )
    )
    return robots_rules(df)


def test_parse_groups_and_multi_agent(spark):
    r = _rules(spark).toPandas()
    a = r[r.host == "a.com"]
    assert set(map(tuple, a[["agent", "path", "allow"]].values)) == {
        ("trainbot", "/private/", False),
        ("trainbot", "/private/ok/", True),
        ("*", "/", False),
    }
    # consecutive UA lines share the rule block; empty Disallow dropped
    b = r[r.host == "b.com"]
    assert ("alpha", "/shared/", False) in set(
        map(tuple, b[["agent", "path", "allow"]].values)
    )
    assert ("beta", "/shared/", False) in set(
        map(tuple, b[["agent", "path", "allow"]].values)
    )
    assert "" not in set(b["path"])


def _eval(spark, urls, agent):
    u = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(len(urls)), "url_canon": urls}
        )
    )
    out = robots_allowed(u, _rules(spark), agent).toPandas()
    return dict(zip(out["url_canon"], out["robots_allowed"]))


def test_longest_match_and_allow_tiebreak(spark):
    got = _eval(
        spark,
        [
            "https://a.com/public/x",        # no trainbot rule matches → allowed
            "https://a.com/private/x",       # Disallow /private/
            "https://a.com/private/ok/x",    # longer Allow wins
        ],
        "TrainBot",                           # case-insensitive product token
    )
    assert got["https://a.com/public/x"] is True
    assert got["https://a.com/private/x"] is False
    assert got["https://a.com/private/ok/x"] is True


def test_specific_group_shadows_star(spark):
    # trainbot has its own group on a.com → the * group (Disallow /) is
    # ignored entirely, even where the specific group has no match
    got = _eval(spark, ["https://a.com/anything"], "trainbot")
    assert got["https://a.com/anything"] is True
    # an unknown agent falls back to * → everything disallowed
    got = _eval(spark, ["https://a.com/anything"], "otherbot")
    assert got["https://a.com/anything"] is False


def test_wildcard_and_end_anchor(spark):
    got = _eval(
        spark,
        [
            "https://b.com/tmp/a.log",   # Disallow /tmp/*.log (len 10) beats Allow /tmp/ (5)
            "https://b.com/tmp/a.txt",   # only Allow /tmp/ matches
            "https://b.com/exact",       # $-anchored disallow
            "https://b.com/exactly",     # anchor must NOT match a prefix
        ],
        "anybot",
    )
    assert got["https://b.com/tmp/a.log"] is False
    assert got["https://b.com/tmp/a.txt"] is True
    assert got["https://b.com/exact"] is False
    assert got["https://b.com/exactly"] is True


def test_host_without_robots_allowed(spark):
    got = _eval(spark, ["https://nothing.com/x"], "trainbot")
    assert got["https://nothing.com/x"] is True


def test_query_string_participates_in_match(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"host": ["q.com"], "robots_txt": ["User-agent: *\nDisallow: /s?page="]})
    )
    u = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": [0, 1], "url_canon": ["https://q.com/s?page=2", "https://q.com/s"]}
        )
    )
    out = robots_allowed(u, robots_rules(df), "x").toPandas()
    got = dict(zip(out["url_canon"], out["robots_allowed"]))
    assert got["https://q.com/s?page=2"] is False
    assert got["https://q.com/s"] is True


def test_crawl_delay_shadowing_and_validation(spark):
    from bloomine_spark.operators.robots import robots_crawl_delays

    hosts = spark.createDataFrame(pd.DataFrame([
        # specific group shadows '*'
        {"host": "a", "robots_txt": "User-agent: trainbot\nCrawl-delay: 7\n"
                                    "\nUser-agent: *\nCrawl-delay: 2\n"},
        # only '*'
        {"host": "b", "robots_txt": "User-agent: *\nCrawl-delay: 3.5\n"},
        # non-numeric drops -> host absent
        {"host": "c", "robots_txt": "User-agent: *\nCrawl-delay: soon\n"},
        # multiple in effective group -> max (politest)
        {"host": "d", "robots_txt": "User-agent: *\nCrawl-delay: 1\n"
                                    "Crawl-delay: 4\n"},
        # case-insensitive agent match, comment stripping
        {"host": "e", "robots_txt": "User-agent: TrainBot # us\n"
                                    "Crawl-delay: 9\n"},
    ]))
    got = {r["host"]: r["crawl_delay"]
           for r in robots_crawl_delays(hosts, "trainbot").collect()}
    assert got == {"a": 7.0, "b": 3.5, "d": 4.0, "e": 9.0}


def test_politeness_schedule_slots(spark):
    from bloomine_spark.operators.robots import politeness_schedule

    urls = spark.createDataFrame(pd.DataFrame([
        {"url": f"https://slow.com/p/{i}"} for i in range(3)
    ] + [{"url": "https://fast.com/x"}]))
    delays = spark.createDataFrame(
        pd.DataFrame([{"host": "slow.com", "crawl_delay": 10.0}])
    )
    out = {(r["host"], r["slot"]): r
           for r in politeness_schedule(urls, delays,
                                        default_delay=0.5).collect()}
    assert out[("slow.com", 0)]["fetch_at_s"] == 0.0
    assert out[("slow.com", 2)]["fetch_at_s"] == 20.0
    # unknown host -> default delay
    assert out[("fast.com", 0)]["crawl_delay"] == 0.5
    # per-host queues: slots restart per host
    assert {k[1] for k in out if k[0] == "slow.com"} == {0, 1, 2}


def test_group_islands_survive_filtered_directives(spark):
    """Regression (review finding): group boundaries are computed over
    EVERY directive line — a path-rule-only group followed by a
    Crawl-delay group must NOT merge, and a Crawl-delay-only group
    followed by a rule group must keep its rules separate."""
    from bloomine_spark.operators.robots import (
        robots_crawl_delays,
        robots_rules,
    )

    hosts = spark.createDataFrame(pd.DataFrame([
        # trainbot's group has rules but NO crawl-delay; slowbot's
        # declares 10 — trainbot must fall through (absent), not inherit
        {"host": "a", "robots_txt": "User-agent: trainbot\n"
                                    "Disallow: /private\n\n"
                                    "User-agent: slowbot\n"
                                    "Crawl-delay: 10\n"},
        # mirror case for rules: alpha's group is crawl-delay-only,
        # beta's has the Disallow — alpha must NOT get beta's rule
        {"host": "b", "robots_txt": "User-agent: alpha\n"
                                    "Crawl-delay: 3\n\n"
                                    "User-agent: beta\n"
                                    "Disallow: /secret\n"},
    ]))
    delays = {r["host"]: r["crawl_delay"]
              for r in robots_crawl_delays(hosts, "trainbot").collect()}
    assert "a" not in delays  # no applicable directive for trainbot or *
    rules = {(r["host"], r["agent"], r["path"])
             for r in robots_rules(hosts).collect()}
    assert ("b", "beta", "/secret") in rules
    assert ("b", "alpha", "/secret") not in rules
