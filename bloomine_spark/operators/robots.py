"""robots.txt (RFC 9309) parsing and URL evaluation — the compliance
stage of a crawl-derived corpus: given each host's robots.txt and a
product token, which fetched URLs were actually allowed?

Both halves are pure DataFrame ops:

* :func:`robots_rules` parses the files relationally — lines explode
  with positions, ``User-agent``/``Allow``/``Disallow`` directives are
  regex-extracted, and RFC group structure (consecutive user-agent
  lines share the following rule block) falls out of a gaps-and-islands
  running sum, exactly the technique the dup-span/gopher operators use.
* :func:`robots_allowed` evaluates URLs: the effective group per host is
  the product token's own group when one exists, else ``*``; among
  matching rules the LONGEST path value wins and an allow/disallow tie
  at equal length resolves to allow (RFC 9309 §2.2.2). ``*`` wildcards
  and the ``$`` end anchor are compiled to a per-rule regex inside the
  rules relation (metacharacters escaped relationally — no Python).

Scale shape: rules are one small relation per host (a crawl has ~one
robots.txt per host) joined to the URL table on host — broadcast- or
shuffle-equi-join, never a cartesian; the longest-match argmax is a
per-URL window over the handful of matching rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["robots_rules", "robots_allowed", "robots_crawl_delays", "politeness_schedule"]


def _grouped_directives(
    df: DataFrame, host_col: str, txt_col: str
) -> DataFrame:
    """(host, pos, directive, value, gid) over EVERY directive line —
    the shared group machinery of :func:`robots_rules` and
    :func:`robots_crawl_delays`. The gaps-and-islands group id must be
    computed BEFORE any directive filter: a new group starts at a
    user-agent line whose previous directive line — of ANY kind — is
    not user-agent, so filtering first would merge two groups whenever
    the directives between their UA lines were outside the filter
    (e.g. a path-rule-only group followed by a Crawl-delay group)."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    )
    nocomment = F.regexp_replace(F.col("line"), r"#.*$", "")
    parsed = lines.select(
        "host",
        "pos",
        F.lower(
            F.regexp_extract(nocomment, r"^\s*([A-Za-z-]+)\s*:", 1)
        ).alias("directive"),
        F.trim(
            F.regexp_extract(nocomment, r"^\s*[A-Za-z-]+\s*:(.*)$", 1)
        ).alias("value"),
    ).filter(F.col("directive") != "")
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("directive") == "user-agent").cast("int")
    return parsed.withColumn(
        "gid",
        F.sum(
            F.when(
                (F.col("directive") == "user-agent")
                & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0),
                1,
            ).otherwise(0)
        ).over(w),
    )


def robots_rules(
    df: DataFrame, host_col: str = "host", txt_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, allow, path, match_regex) — one row per (group
    member agent × rule). Comments strip at ``#``; empty rule values
    match nothing and drop (an empty ``Disallow:`` means allow-all per
    RFC); agents compare case-insensitively."""
    grouped = _grouped_directives(df, host_col, txt_col).filter(
        F.col("directive").isin("user-agent", "allow", "disallow")
    )
    uas = grouped.filter(F.col("directive") == "user-agent").select(
        "host", "gid", F.lower(F.col("value")).alias("agent")
    )
    rules = grouped.filter(
        (F.col("directive") != "user-agent") & (F.col("value") != "")
    ).select(
        "host",
        "gid",
        (F.col("directive") == "allow").alias("allow"),
        F.col("value").alias("path"),
    )
    # compile the RFC matcher per rule: strip a trailing $ into an end
    # anchor, regex-escape the rest, '*' -> '.*'
    anchored = F.col("path").endswith("$")
    body = F.when(anchored, F.expr("substring(path, 1, length(path) - 1)")).otherwise(
        F.col("path")
    )
    escaped = F.regexp_replace(body, r"([.^$+?()\[\]{}|\\])", r"\\$1")
    regex = F.concat(
        F.lit("^"),
        F.regexp_replace(escaped, r"\*", ".*"),
        F.when(anchored, F.lit("$")).otherwise(F.lit("")),
    )
    return (
        uas.join(rules, ["host", "gid"])
        .select("host", "agent", "allow", "path", regex.alias("match_regex"))
        .distinct()
    )


def _url_path(url: Column) -> Column:
    p = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    url_col: str = "url_canon",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adds (robots_allowed, robots_rule) per URL for one product token.
    Effective group: the agent's own rules when the host defines any,
    else the ``*`` group; no rules / no match → allowed (RFC default).
    Longest path value wins; at equal length allow beats disallow."""
    a = agent.lower()
    host = F.regexp_extract(F.col(url_col), r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    u = urls.withColumn("_host", host).withColumn(
        "_path", _url_path(F.col(url_col))
    )
    cand = rules.filter(F.col("agent").isin(a, "*"))
    has_specific = cand.groupBy("host").agg(
        F.max((F.col("agent") == a).cast("int")).alias("_spec")
    )
    effective = (
        # per-host 1-row specificity marker and the rules relation stay
        # on the broadcast side explicitly (static auto-broadcast is off
        # session-wide; these are host-bounded, orders smaller than the
        # URL table). A window-max variant was measured and REJECTED
        # (0.83 -> 1.31 s at sf0.1: the window's host sort under the
        # broadcast build cost more than the duplicated parse).
        cand.join(F.broadcast(has_specific), "host")
        .filter(
            (F.col("agent") == a)
            | ((F.col("agent") == "*") & (F.col("_spec") == 0))
        )
        .select("host", "allow", "path", "match_regex")
    )
    joined = u.join(
        F.broadcast(effective.withColumnRenamed("host", "_host")),
        "_host", "left"
    ).withColumn(
        "_match",
        F.col("path").isNotNull()
        & F.expr("_path rlike match_regex"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.when(F.col("_match"), F.length("path")).otherwise(-1).desc(),
        F.col("allow").desc_nulls_last(),
        F.col("path").asc_nulls_last(),
    )
    best = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            *[F.col(c) for c in urls.columns],
            F.when(F.col("_match"), F.col("allow"))
            .otherwise(F.lit(True))
            .alias("robots_allowed"),
            F.when(F.col("_match"), F.col("path")).alias("robots_rule"),
        )
    )
    return best


def robots_crawl_delays(
    df: DataFrame,
    agent: str,
    host_col: str = "host",
    txt_col: str = "robots_txt",
) -> DataFrame:
    """(host, crawl_delay) from ``Crawl-delay`` directives — the de
    facto politeness extension beside the RFC 9309 core (Bing/Yandex
    honor it; parsing shares the gaps-and-islands group machinery of
    :func:`robots_rules`). The product token's own group SHADOWS ``*``
    (same precedence rule as path rules); non-numeric values drop;
    multiple delays in the effective group resolve to the MAX (the
    politest reading). Hosts with no applicable directive are absent —
    join back with a default.
    """
    grouped = _grouped_directives(df, host_col, txt_col).filter(
        F.col("directive").isin("user-agent", "crawl-delay")
    )
    # one conditional aggregation per (host, gid) instead of a UA×delay
    # self-join of two filtered copies of the parse (each copy re-ran
    # the whole directive parse + grouping windows): collect the group's
    # agents and its max numeric delay in the same pass, then explode.
    # Identical semantics — the join required a UA row AND a delay row
    # in the group (inner), mirrored by the non-empty-agents explode and
    # the _d null filter; max-of-group then max-over-groups = the same
    # max the joined groupBy took.
    per_group = (
        grouped.groupBy("host", "gid")
        .agg(
            F.collect_list(
                F.when(
                    F.col("directive") == "user-agent",
                    F.lower(F.col("value")),
                )
            ).alias("_agents"),
            F.max(
                F.when(
                    (F.col("directive") == "crawl-delay")
                    & F.col("value").rlike(r"^[0-9]+(\.[0-9]+)?$"),
                    F.col("value").cast("double"),
                )
            ).alias("_d"),
        )
        .filter(F.col("_d").isNotNull())
    )
    per_agent = (
        per_group.select(
            "host", F.explode("_agents").alias("agent"), F.col("_d")
        )
        .filter(F.col("agent").isin(agent.lower(), "*"))
        .groupBy("host", "agent")
        .agg(F.max("_d").alias("delay"))
    )
    pick = Window.partitionBy("host").orderBy(
        F.when(F.col("agent") == agent.lower(), 0).otherwise(1)
    )
    return (
        per_agent.withColumn("_rk", F.row_number().over(pick))
        .filter(F.col("_rk") == 1)
        .select("host", F.col("delay").alias("crawl_delay"))
    )


def politeness_schedule(
    urls: DataFrame,
    delays: DataFrame | None = None,
    url_col: str = "url",
    host_col: str | None = None,
    default_delay: float = 1.0,
    order_col: str | None = None,
) -> DataFrame:
    """Per-host fetch schedule under politeness delays — the frontier
    planning step between URL dedup and the fetcher: within each host
    URLs serialize into slots (``order_col`` if given, else URL order —
    deterministic either way) and ``fetch_at_s = slot × delay``; hosts
    are independent, so the crawl's makespan is the politest host's
    queue, not the URL count. ``delays`` is a (host, crawl_delay)
    relation (:func:`robots_crawl_delays`), broadcast-joined; absent
    hosts use ``default_delay``.

    One narrow (host, url) rank window + one broadcast join — the plan
    a 100 TB frontier needs (per-host queues are the unit of work a
    fetcher fleet shards over).
    """
    from bloomine_spark.operators.linkgraph import host_of

    host = (
        F.col(host_col) if host_col else host_of(F.col(url_col))
    ).alias("host")
    rel = urls.select(F.col(url_col).alias("url"), host)
    w = Window.partitionBy("host").orderBy(
        F.col(order_col) if order_col else F.col("url")
    )
    ranked = rel.withColumn("slot", F.row_number().over(w) - 1)
    if delays is not None:
        ranked = ranked.join(F.broadcast(delays), "host", "left")
    else:
        ranked = ranked.withColumn(
            "crawl_delay", F.lit(None).cast("double")
        )
    return ranked.select(
        "host",
        "url",
        "slot",
        F.coalesce("crawl_delay", F.lit(float(default_delay)))
        .alias("crawl_delay"),
        (
            F.col("slot")
            * F.coalesce("crawl_delay", F.lit(float(default_delay)))
        ).alias("fetch_at_s"),
    )
