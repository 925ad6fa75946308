"""Web-corpus front-end operators: HTML→text extraction and URL
canonicalization/filtering — the stage every web-scale training-data
pipeline (C4, CCNet, RefinedWeb, FineWeb) runs BEFORE the text filters
this repo already implements.

Everything here is a chain of built-in string expressions
(regexp_replace / regexp_extract / lower / trim), so it is pure
whole-stage-codegen — zero Python in the hot path, pushdown-friendly,
and exactly reproducible in any RE2/Java-regex engine (the DuckDB
oracles run the same patterns). The regex subset is deliberately
common to Java regex and RE2: no lookarounds, no backreferences,
inline (?is) flags only.

HTML extraction is the rule-based tier (tag semantics, not statistical
boilerplate removal): kill non-content subtrees (script/style/head…),
turn block-level boundaries into newlines, strip remaining tags,
decode the six standard entities, normalize whitespace. That is the
deterministic 80% of trafilatura-style extraction; link-density
boilerplate scoring sits on top of the SAME primitives when needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "html_extract",
    "html_text_expr",
    "html_extract_main",
    "html_meta",
    "sitemap_entries",
    "canonical_url_expr",
    "canonicalize_url_df",
    "url_filter",
    "url_dedup_with_host_cap",
]


# non-content subtrees whose inner text must never leak into the corpus.
# One alternation of per-tag patterns — a backreference (</\1>) would be
# shorter but RE2 (the DuckDB oracle engine) has no backreferences.
_KILL_BLOCKS = "(?is)" + "|".join(
    rf"<{tag}\b[^>]*>.*?</{tag}\s*>"
    for tag in ("script", "style", "noscript", "head", "svg", "iframe")
)
_COMMENTS = r"(?s)<!--.*?-->"
# block-level boundaries become newlines so sentence/line filters see
# real document structure instead of one glued line
_BLOCK_TAGS = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|"
    r"header|footer|nav|blockquote|pre|form)\b[^>]*/?>"
)
_ANY_TAG = r"(?s)<[^>]*>"


def html_text_expr(col: Column) -> Column:
    """The extraction chain as a single composable Column expression."""
    t = F.regexp_replace(col, _KILL_BLOCKS, " ")
    t = F.regexp_replace(t, _COMMENTS, " ")
    t = F.regexp_replace(t, _BLOCK_TAGS, "\n")
    t = F.regexp_replace(t, _ANY_TAG, " ")
    # entity decode: named entities first, ampersand LAST so a literal
    # "&amp;lt;" decodes to "&lt;" (one level), not "<"
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    # whitespace normalization: collapse horizontal runs, trim line
    # edges, collapse blank-line runs, trim the document
    t = F.regexp_replace(t, r"[ \t\r\f]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{2,}", "\n")
    # trim() strips only spaces; block-tag newlines at the document
    # edges need an explicit edge strip
    t = F.regexp_replace(t, r"^\n+|\n+$", "")
    return F.trim(t)


def html_extract(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """(id, *keep, text, n_lines) from raw HTML. Zero-exchange codegen
    map; ``keep`` columns ride along (no join needed downstream)."""
    text = html_text_expr(F.col(html_col))
    return df.select(
        F.col(id_col),
        *keep,
        text.alias("text"),
        F.when(text == "", F.lit(0))
        .otherwise(F.size(F.split(text, "\n")))
        .cast("long")
        .alias("n_lines"),
    )


# anchor ELEMENT (tag + inner text) — used for link-density scoring;
# lazy inner match, same Java∩RE2 subset
_A_INNER = r"(?is)<a\b[^>]*>(.*?)</a\s*>"
_WS_RUN = r"[ \t\r\f]+"

# head metadata patterns (first match wins, like real parsers reading a
# streamed head); content/href values in either quote style
_TITLE = r"(?is)<title[^>]*>(.*?)</title\s*>"
_META_NAME = (
    r"""(?is)<meta\b[^>]*\bname\s*=\s*["']{0}["'][^>]*"""
    r"""\bcontent\s*=\s*["']([^"'<>]*)["']"""
)
_META_PROP = (
    r"""(?is)<meta\b[^>]*\bproperty\s*=\s*["']og:{0}["'][^>]*"""
    r"""\bcontent\s*=\s*["']([^"'<>]*)["']"""
)
_CANONICAL = (
    r"""(?is)<link\b[^>]*\brel\s*=\s*["']canonical["'][^>]*"""
    r"""\bhref\s*=\s*["']([^"'<>]+)["']"""
)


def _meta_clean(col: Column) -> Column:
    """Entity decode + whitespace fold for extracted metadata values."""
    t = col
    for ent, ch in (
        ("&nbsp;", " "),
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&amp;", "&"),
    ):
        t = F.replace(t, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_meta(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """(id, title, description, canonical_url, og_title) — the head
    metadata web corpora keep beside extracted text (titles ride into
    training data; canonical URLs feed URL dedup; og: fields are the
    de-facto social card schema). First match wins for each field,
    exactly like a streaming head parser; empty → NULL. Zero-exchange
    codegen map, same Java∩RE2 pattern subset as the rest of webops."""
    html = F.col(html_col)

    def first(pattern: str) -> Column:
        v = _meta_clean(F.regexp_extract(html, pattern, 1))
        return F.when(v != "", v)

    return df.select(
        F.col(id_col),
        first(_TITLE).alias("title"),
        first(_META_NAME.format("description")).alias("description"),
        F.when(
            F.regexp_extract(html, _CANONICAL, 1) != "",
            F.regexp_extract(html, _CANONICAL, 1),
        ).alias("canonical_url"),
        first(_META_PROP.format("title")).alias("og_title"),
    )


def html_extract_main(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    max_link_density: float = 0.5,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """html_extract plus the link-density boilerplate tier (the
    deterministic core of jusText/trafilatura block scoring): after
    non-content subtrees are killed and block tags become newlines,
    each block line whose visible text is mostly anchor text
    (anchor-chars / text-chars > ``max_link_density``) is navigation
    and is dropped before tag stripping. Output adds
    ``n_boilerplate_lines``. Still one zero-exchange codegen map —
    the per-line work is higher-order array expressions (transform/
    filter) over the block split, never Python."""
    t = F.regexp_replace(F.col(html_col), _KILL_BLOCKS, " ")
    t = F.regexp_replace(t, _COMMENTS, " ")
    t = F.regexp_replace(t, _BLOCK_TAGS, "\n")
    lines = F.split(t, "\n")

    def _vis_len(line: Column) -> Column:
        # visible text length: tags → space, whitespace runs folded
        return F.length(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(line, _ANY_TAG, " "), _WS_RUN, " "
                )
            )
        )

    def _anchor_len(line: Column) -> Column:
        return F.length(
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.array_join(
                            F.regexp_extract_all(line, F.lit(_A_INNER), F.lit(1)),
                            " ",
                        ),
                        _ANY_TAG,
                        " ",
                    ),
                    _WS_RUN,
                    " ",
                )
            )
        )

    def _is_boiler(line: Column) -> Column:
        return (_vis_len(line) > 0) & (
            _anchor_len(line) > F.lit(max_link_density) * _vis_len(line)
        )

    kept_html = F.array_join(
        F.filter(lines, lambda l: ~_is_boiler(l)), "\n"
    )
    text = html_text_expr(kept_html)
    return df.select(
        F.col(id_col),
        *keep,
        text.alias("text"),
        F.when(text == "", F.lit(0))
        .otherwise(F.size(F.split(text, "\n")))
        .cast("long")
        .alias("n_lines"),
        F.size(F.filter(lines, _is_boiler)).cast("long").alias(
            "n_boilerplate_lines"
        ),
    )


# sitemap entry blocks (<url>…</url> in urlsets, <sitemap>…</sitemap>
# in index files) and their children
_SM_BLOCK = r"(?is)<(?:url|sitemap)\b[^>]*>(.*?)</(?:url|sitemap)\s*>"
_SM_LOC = r"(?is)<loc\s*>\s*([^<]*?)\s*</loc\s*>"
_SM_LASTMOD = r"(?is)<lastmod\s*>\s*([^<]*?)\s*</lastmod\s*>"


def sitemap_entries(
    df: DataFrame, xml_col: str = "xml", id_col: str = "doc_id"
) -> DataFrame:
    """(id, loc, lastmod, is_index) — one row per ``<url>``/``<sitemap>``
    block of a sitemap file (sitemaps.org protocol), the crawl-frontier
    discovery complement to robots.txt. ``is_index`` marks entries of a
    ``<sitemapindex>`` (their locs are MORE sitemaps to fetch, not
    pages). lastmod stays a string: the protocol allows both dates and
    full W3C datetimes — parsing is the caller's policy. Entries
    without a ``<loc>`` drop. Zero-exchange codegen map (one
    regexp_extract_all + explode, per-block extracts)."""
    xml = F.col(xml_col)
    is_index = xml.rlike(r"(?is)<\s*sitemapindex\b")
    block = F.col("_block")
    loc = F.regexp_extract(block, _SM_LOC, 1)
    lastmod = F.regexp_extract(block, _SM_LASTMOD, 1)
    return (
        df.select(
            F.col(id_col),
            is_index.alias("is_index"),
            F.explode(
                F.regexp_extract_all(xml, F.lit(_SM_BLOCK), F.lit(1))
            ).alias("_block"),
        )
        .select(
            F.col(id_col),
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            "is_index",
        )
        .filter(F.col("loc") != "")
    )


# ---------------------------------------------------------------------------
# URLs
# ---------------------------------------------------------------------------

_TRACKING = r"(utm_[a-z]+|fbclid|gclid|msclkid|ref_src)=[^&#]*"


def canonical_url_expr(col: Column) -> Column:
    """Canonical form: lowercase scheme+host, `www.` and default ports
    stripped, fragment dropped, tracking params removed, empty path →
    `/`. A pure expression so it composes into dedup keys."""
    url = F.regexp_replace(col, r"#.*$", "")  # fragment
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    # default ports only (any other explicit port is meaningful)
    host = F.when(
        (scheme == "http"), F.regexp_replace(host, r":80$", "")
    ).otherwise(host)
    host = F.when(
        (scheme == "https"), F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    rest = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", 1)
    rest = F.regexp_replace(rest, _TRACKING, "")
    # tidy separators the param removal left behind: "?&", "&&", "?$", "&$"
    rest = F.regexp_replace(rest, r"\?&+", "?")
    rest = F.regexp_replace(rest, r"&&+", "&")
    rest = F.regexp_replace(rest, r"[?&]+$", "")
    rest = F.when(rest == "", F.lit("/")).otherwise(rest)
    return F.concat(scheme, F.lit("://"), host, rest)


def canonicalize_url_df(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Adds `url_canon` — the DataFrame form of ``canonical_url_expr``."""
    return df.withColumn("url_canon", canonical_url_expr(F.col(url_col)))


_NON_DOC_EXT = (
    r"(?i)\.(jpe?g|png|gif|webp|svg|ico|css|js|json|xml|zip|gz|tar|rar|"
    r"exe|dmg|apk|mp3|mp4|avi|mov|woff2?)([?#].*)?$"
)


def url_filter(
    df: DataFrame,
    url_col: str = "url_canon",
    blocked_hosts: list[str] | None = None,
    max_path_depth: int = 12,
    max_len: int = 2048,
) -> DataFrame:
    """FIRST-FAILING-RULE URL filter (c4_clean convention): adds
    (url_keep, url_reason). Rules: parseable scheme, length cap,
    non-document extension, blocked-host substring list, path-depth cap
    (crawler-trap calendars/faceted search explode path depth)."""
    url = F.col(url_col)
    host = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    depth = F.size(F.split(F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://[^/?#]*([^?#]*)", 1), "/")) - 1
    blocked = F.lit(False)
    for b in blocked_hosts or []:
        blocked = blocked | host.contains(b.lower())
    reason = (
        F.when(F.regexp_extract(url, r"^(https?)://", 1) == "", "scheme")
        .when(F.length(url) > max_len, "too_long")
        .when(url.rlike(_NON_DOC_EXT), "extension")
        .when(blocked, "blocked_host")
        .when(depth > max_path_depth, "path_depth")
    )
    return df.withColumn("url_reason", reason).withColumn(
        "url_keep", F.col("url_reason").isNull()
    )


def url_dedup_with_host_cap(
    df: DataFrame,
    url_col: str = "url_canon",
    id_col: str = "doc_id",
    max_per_host: int | None = None,
) -> DataFrame:
    """URL-level exact dedup (min-id survivor per canonical URL) plus an
    optional per-host document cap (md5-rank quota like
    stratified_sample — content-deterministic, so re-crawls keep the
    same survivors). Adds (url_rank, host_rank, keep). The host window
    orders URL-survivors FIRST, so the quota is spent on deduped URLs —
    duplicate rows can never crowd a survivor out of its host's cap.
    Both windows are hash-exchange + WindowGroupLimit-eligible rank
    filters — narrow at any corpus size."""
    from pyspark.sql import Window

    url = F.col(url_col)
    host = F.regexp_extract(url, r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
    w_url = Window.partitionBy(url_col).orderBy(F.col(id_col))
    out = df.withColumn(
        "url_rank", F.row_number().over(w_url).cast("long")
    ).withColumn("_host", host)
    keep = F.col("url_rank") == 1
    if max_per_host is not None:
        w_host = Window.partitionBy("_host").orderBy(
            (F.col("url_rank") != 1).cast("int"),
            F.md5(F.col(id_col).cast("string")),
            F.col(id_col),
        )
        out = out.withColumn(
            "host_rank", F.row_number().over(w_host).cast("long")
        )
        keep = keep & (F.col("host_rank") <= max_per_host)
    return out.withColumn("keep", keep).drop("_host")
