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
    "resolve_entities",
]


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
    a, b = sized.alias("a"), sized.alias("b")
    dist = F.levenshtein(F.col("a.txt"), F.col("b.txt"), max_dist)
    # length prefilter: |len(a)-len(b)| <= k is necessary for edit
    # distance <= k (each edit changes length by at most 1) — the SSJoin
    # length filter; it prunes the pair set BEFORE any DP runs
    return (
        a.join(
            b,
            (F.col("a.block_key") == F.col("b.block_key"))
            & (F.col("a.id") < F.col("b.id"))
            & (
                F.abs(F.length(F.col("a.txt")) - F.length(F.col("b.txt")))
                <= F.lit(int(max_dist))
            ),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.block_key").alias("block_key"),
            dist.alias("dist"),
        )
        .filter(F.col("dist") >= 0)  # banded levenshtein: -1 = above band
    )


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
