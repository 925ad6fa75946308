"""Entity resolution / record linkage: blocked fuzzy-pair generation,
key-collision (fingerprint) clustering, and pair→cluster→canonical
resolution.

The classic linkage pipeline (Fellegi–Sunter framing, OpenRefine's
clustering methods) re-expressed as Catalyst plans:

* ``fingerprint_key`` / ``fingerprint_clusters`` — OpenRefine's
  "fingerprint" method: lowercase, strip punctuation, token-sort,
  token-dedup. Records that normalize to the same key are duplicates
  under whitespace/case/token-order/punctuation noise. One hash
  exchange on the key; no pairwise work at all — the O(n) front door
  every linkage run should take before any edit-distance pass.
* ``blocked_edit_pairs`` — candidate pairs by blocking key +
  Levenshtein verify inside blocks. Blocking bounds the quadratic
  blow-up to Σ|block|²; the block-size cap fails fast when a key is
  degenerate (the skew guard — a 100 TB run with an unexpected hot
  block should error, not detonate the shuffle). Levenshtein runs
  JVM-side with the banded ``threshold`` variant (O(len·k), not
  O(len²)) and only on pairs that share a block.
* ``resolve_entities`` — pairs → connected components → one canonical
  record per entity cluster (reuses :func:`dedup_groups`, the same
  large-star/small-star machinery as corpus dedup).

Blocking is recall-heuristic by construction: a true pair whose records
disagree on the blocking key is missed (documented, standard). The
default key — fingerprint's first token — survives edits anywhere
except that token.

Reference behavior parity: the reference engine has no record-linkage
tier (it screens sequences); these extend the engine for the
training-data/analytics tier the brief asks for beyond the reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "fingerprint_key",
    "fingerprint_clusters",
    "blocked_edit_pairs",
    "blocked_jw_pairs",
    "jaro_winkler",
    "soundex_key",
    "resolve_entities",
]


def jaro_winkler(a: str, b: str) -> float:
    """Jaro–Winkler similarity (Winkler 1990), the record-linkage
    standard for short name fields: Jaro = mean of (m/|a|, m/|b|,
    (m−t)/m) with greedy window matching (window = ⌊max/2⌋−1, first
    unmatched occurrence wins) and t = half the out-of-order matches;
    Winkler boosts by prefix·0.1·(1−jaro) — common prefix capped at 4 —
    only when jaro exceeds the classic 0.7 threshold. Either side
    empty → 0.0.

    The exact variant DuckDB's ``jaro_winkler_similarity`` implements
    (probed: boost threshold 0.7, cap 4, p=0.1), which is what lets
    the driver oracle call the builtin verbatim — the similarity is
    computed by two independent engines and hash-compared.
    """
    if not a or not b:
        return 0.0
    la, lb = len(a), len(b)
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    b_hit = [False] * lb
    a_hit = [False] * la
    m = 0
    for i in range(la):
        ca = a[i]
        lo = i - window if i > window else 0
        hi = i + window + 1
        if hi > lb:
            hi = lb
        for j in range(lo, hi):
            if not b_hit[j] and b[j] == ca:
                b_hit[j] = True
                a_hit[i] = True
                m += 1
                break
    if m == 0:
        return 0.0
    b_seq = [b[j] for j in range(lb) if b_hit[j]]
    t = 0
    k = 0
    for i in range(la):
        if a_hit[i]:
            if a[i] != b_seq[k]:
                t += 1
            k += 1
    t //= 2
    j = (m / la + m / lb + (m - t) / m) / 3.0
    if j > 0.7:
        p = 0
        for x, y in zip(a, b):
            if x != y or p >= 4:
                break
            p += 1
        j += p * 0.1 * (1.0 - j)
    return j


def fingerprint_key(col: Column | str) -> Column:
    """OpenRefine fingerprint: lowercase → non-alphanumerics to spaces →
    split → drop empties → sort → dedup → single-space join. Pure
    codegen (no UDF); ASCII semantics (the engine-portable subset)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(c), r"[^a-z0-9 ]", " "), r" +"),
        lambda x: x != "",
    )
    return F.array_join(F.array_sort(F.array_distinct(toks)), " ")


def fingerprint_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One row per input record: ``(id, fingerprint, cluster_size,
    canonical_id, keep)`` where records sharing a fingerprint form a
    cluster, ``canonical_id`` is the cluster's min id and ``keep`` marks
    it. Plan: one hash exchange on the fingerprint; cluster stats are
    window functions over it — no join, no pairwise stage."""
    from pyspark.sql import Window

    w = Window.partitionBy("fingerprint")
    return (
        df.select(
            F.col(id_col).alias("id"),
            fingerprint_key(text_col).alias("fingerprint"),
        )
        .withColumn("cluster_size", F.count("*").over(w))
        .withColumn("canonical_id", F.min("id").over(w))
        .withColumn("keep", F.col("id") == F.col("canonical_id"))
    )


def blocked_edit_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: Column | str | None = None,
    max_dist: int = 2,
    max_block: int = 10_000,
) -> DataFrame:
    """Candidate fuzzy-match pairs: records sharing a blocking key,
    verified by Levenshtein ≤ ``max_dist`` on ``text_col`` →
    ``(id_a, id_b, block_key, dist)`` with ``id_a < id_b``.

    ``block`` defaults to the first token of the fingerprint key (so
    case/punctuation noise never splits a block). A block holding more
    than ``max_block`` records raises — Σ|block|² is the cost bound and
    a degenerate key (empty names, a filler value like "unknown") must
    fail fast rather than melt the self-join. The verify uses Spark's
    banded ``levenshtein(l, r, threshold)`` (O(len·max_dist) per pair,
    JVM codegen); distance 0 pairs (exact dups under blocking) are
    included.

    Pair enumeration joins on ``(block_key, length-bucket)``, not on the
    block alone: |len(a)−len(b)| ≤ k is necessary for edit distance ≤ k
    (each edit moves length by at most 1), so bucketing lengths at width
    k+1 and probing each row against its bucket and both neighbors
    enumerates every qualifying pair exactly once while skipping the
    vast majority of same-block pairs whose lengths already rule them
    out. This matters doubly because Catalyst merges the ``dist >= 0``
    filter into the join condition and evaluates the levenshtein FIRST:
    without the bucket key every enumerated pair paid the O(len·k) DP
    (Σ|block|² ≈ 1.1e8 DPs at sf1.0); with it only length-compatible
    pairs reach the condition at all (~2% here). Results are identical —
    the exact |Δlen| ≤ k predicate still applies.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    bcol = (
        F.element_at(F.split(fingerprint_key(text_col), " "), 1)
        if block is None
        else (F.col(block) if isinstance(block, str) else block)
    )
    rel = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        bcol.alias("block_key"),
    ).filter(F.col("block_key").isNotNull() & (F.col("block_key") != ""))

    # fail-fast skew guard: one partial-aggregated (block_key, count)
    # relation instead of the previous full window pass (the window
    # shuffled and sorted every (id, txt) row; the aggregate moves only
    # one row per block after map-side combine)
    bad = (
        rel.groupBy("block_key")
        .agg(F.count("*").alias("_bn"))
        .filter(F.col("_bn") > max_block)
        .select("block_key")
        .first()
    )
    if bad is not None:
        raise ValueError(
            f"block {bad[0]!r} exceeds max_block={max_block}; pick a more "
            "selective blocking key or raise max_block"
        )
    bw = int(max_dist) + 1
    ln = F.length(F.col("txt"))
    probe = rel.select(
        "id", "txt", "block_key", ln.alias("ln"),
        F.explode(
            F.array(
                F.floor(ln / bw) - 1, F.floor(ln / bw), F.floor(ln / bw) + 1
            )
        ).alias("lb"),
    ).alias("a")
    build = rel.select(
        "id", "txt", "block_key", ln.alias("ln"),
        F.floor(ln / bw).alias("lb"),
    ).alias("b")
    dist = F.levenshtein(F.col("a.txt"), F.col("b.txt"), max_dist)
    return (
        probe.join(
            build,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= F.lit(int(max_dist)))
            # the DP stays INSIDE the join condition, after the cheap
            # predicates, so no post-join Filter gets re-merged in front
            # of it by the optimizer
            & (dist >= 0),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.block_key").alias("block_key"),
            dist.alias("dist"),
        )
    )


# American Soundex letter→code map (NARA): H/W get sentinel 7 so the
# "same code separated by H or W collapses" rule falls out of removing
# 7s BEFORE the run-collapse; vowels map to 0 (separators, removed last)
_SX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_SX_TO = "11112222222233455600000077"


def soundex_key(col: Column | str) -> Column:
    """American Soundex (NARA variant, H/W-transparent) as a pure
    codegen expression chain — shared formula with the DuckDB oracles:
    translate to digit codes, drop the H/W sentinel, collapse digit
    runs with per-digit ``d+`` replaces (NO backreferences — DuckDB's
    RE2 has none, and keeping the patterns engine-portable is the
    contract), drop the first letter's own code unless the name starts
    with H/W (whose sentinel already vanished), strip vowel separators,
    pad to letter+3. Non-letters are stripped first; an empty result →
    NULL. Canonical vector (Robert R163, Ashcraft A261 — the H/W rule —
    Tymczak T522, Pfister P236, Washington W252, Hubert H163) is
    pytest-pinned."""
    c = F.col(col) if isinstance(col, str) else col
    s1 = F.regexp_replace(F.upper(c), "[^A-Z]", "")
    t = F.translate(s1, _SX_FROM, _SX_TO)
    t = F.regexp_replace(t, "7", "")
    for d in "0123456":
        t = F.regexp_replace(t, d + "+", d)
    first = F.substring(s1, 1, 1)
    tail = F.when(
        first.isin("H", "W"), t
    ).otherwise(F.substring(t, 2, 1_000_000))
    digits = F.regexp_replace(tail, "0", "")
    return F.when(F.length(s1) == 0, F.lit(None).cast("string")).otherwise(
        F.concat(first, F.rpad(F.substring(digits, 1, 3), 3, "0"))
    )


def blocked_jw_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: Column | str | None = None,
    min_sim: float = 0.9,
    max_block: int = 10_000,
) -> DataFrame:
    """Candidate fuzzy-match pairs by Jaro–Winkler ≥ ``min_sim`` inside
    blocks → ``(id_a, id_b, block_key, jw)`` with ``id_a < id_b`` — the
    similarity-threshold sibling of :func:`blocked_edit_pairs` for name
    fields, where a fixed edit budget misreads long-vs-short names but
    a relative similarity does not.

    Same blocking skeleton (default: first fingerprint token;
    ``max_block`` fails fast on degenerate keys). Before any Python
    runs, a codegen length-ratio prefilter prunes pairs that cannot
    reach ``min_sim``: jaro ≤ (r+2)/3 for r = min_len/max_len, and the
    Winkler boost maps jw ≥ s back to jaro ≥ (s−0.4)/0.6, so
    r ≥ 5s−4 is necessary — at s=0.9 that halves the survivor set
    before the kernel sees it. The JW verify itself is an Arrow-batched
    pandas UDF over the post-block post-prefilter pairs only (the slow
    path never touches the full cross-block relation).
    """
    if not 0.0 < min_sim <= 1.0:
        raise ValueError("min_sim must be in (0, 1]")
    bcol = (
        F.element_at(F.split(fingerprint_key(text_col), " "), 1)
        if block is None
        else (F.col(block) if isinstance(block, str) else block)
    )
    rel = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("txt"),
        bcol.alias("block_key"),
    ).filter(F.col("block_key").isNotNull() & (F.col("block_key") != ""))

    from pyspark.sql import Window

    sized = rel.withColumn(
        "_bn", F.count("*").over(Window.partitionBy("block_key"))
    )
    bad = sized.filter(F.col("_bn") > max_block).select("block_key").first()
    if bad is not None:
        raise ValueError(
            f"block {bad[0]!r} exceeds max_block={max_block}; pick a more "
            "selective blocking key or raise max_block"
        )

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # pandas stays a lazy dependency of this module (r6 ADVICE: pure-
    # codegen consumers — soundex_key, fingerprint_key — must import
    # without it), but pandas_udf resolves the 'pd.Series' annotations
    # through MODULE globals, so the lazy import must register there
    globals().setdefault("pd", pd)

    @pandas_udf("double")
    def _jw(xa: pd.Series, xb: pd.Series) -> pd.Series:
        return pd.Series(
            [jaro_winkler(x, y) for x, y in zip(xa, xb)], dtype="float64"
        )

    a, b = sized.alias("a"), sized.alias("b")
    ratio_floor = 5.0 * float(min_sim) - 4.0
    cand = a.join(
        b,
        (F.col("a.block_key") == F.col("b.block_key"))
        & (F.col("a.id") < F.col("b.id"))
        & (
            # length-ratio necessity: min_len >= (5s-4) * max_len
            F.least(F.length("a.txt"), F.length("b.txt"))
            >= F.lit(ratio_floor)
            * F.greatest(F.length("a.txt"), F.length("b.txt"))
        ),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.block_key").alias("block_key"),
        _jw(F.col("a.txt"), F.col("b.txt")).alias("jw"),
    )
    return cand.filter(F.col("jw") >= F.lit(float(min_sim)))


def resolve_entities(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Pairs → entity clusters → canonical record: one row per input
    record ``(id, group_id, group_size, keep)``. Delegates to
    :func:`bloomine_spark.operators.dedup.dedup_groups` (alternating
    large-star/small-star components, min-id or max-quality survivor) —
    entity resolution IS corpus dedup's group stage over a different
    pair generator."""
    from bloomine_spark.operators.dedup import dedup_groups

    return dedup_groups(
        df, pairs.select("id_a", "id_b"), id_col=id_col,
        quality_col=quality_col,
    )
