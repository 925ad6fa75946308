"""Priority sampling (Duffield, Lund & Thorup, JACM 2007) — a mergeable
fixed-size WEIGHTED sample with an unbiased subset-sum estimator, the
standard sketch for "keep k representative rows per group, weighted by
size" (Apache DataSketches ships it as the sampling family next to the
HLL/KLL/theta sketches this repo already implements).

Scheme: each row draws u ∈ (0,1] and gets priority q = weight / u; the
sample is the top-k rows by priority, and τ = the (k+1)-th priority.
Any subset-sum Σ weight is estimated by Σ max(weight, τ) over the
sample ∩ subset — unbiased (DLT Theorem 1), exact when the group has
≤ k rows (τ = 0). Top-k by a fixed score is distributive, so the
sketch merges by unioning samples and re-taking the top-k — the same
tree-merge shape as the other sketches here, with O(k) state.

This implementation is PURE Catalyst algebra: u comes from the md5 of
the row key (the relational-sketch parity trick used across this repo),
so the sample is a deterministic pure function of (key, salt) — stable
under repartitioning, resumable, identical across engines, and directly
oracle-checkable in SQL. The per-group top-k runs as a rank window
whose filter Spark ≥3.5 rewrites into WindowGroupLimit: each map task
keeps only its local top-(k+1) per group BEFORE the exchange, so the
shuffle carries O(parts · k) rows per group, not the corpus — the shape
that survives 100 TB.

Reference anchor: BlooMine keeps every passing read (FPscreen.py /
SPscreen.py write all hits); at corpus scale the analogous triage is a
bounded weighted sample per source with calibrated total-mass
estimates, which is exactly this sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["priority_sample"]

_U32 = 4294967296.0  # 2^32


def _priority_expr(key_col: str, weight_col: str, salt: str):
    """q = weight / u with u = (h32 + 1) / 2^32 ∈ (0, 1], h32 = first 8
    hex chars of md5(salt:key) — the repo-wide cross-engine uniform."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(key_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    u = (h + F.lit(1)) / F.lit(_U32)
    return F.col(weight_col).cast("double") / u


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Top-k-by-priority weighted sample per group (global if
    ``group_col`` is None). Emits one row per sampled item:
    (group?, key, weight, priority, rank, est_weight) where
    ``est_weight = max(weight, τ)`` is the DLT subset-sum estimator
    term — Σ est_weight over any filtered subset of the sample
    estimates that subset's true total weight.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    part = [group_col] if group_col else []
    w = Window.partitionBy(*part).orderBy(
        F.desc("priority"), F.col(key_col).asc()
    )
    cols = ([group_col] if group_col else []) + [key_col]
    ranked = (
        df.select(
            *cols,
            F.col(weight_col).cast("long").alias("weight"),
            _priority_expr(key_col, weight_col, salt).alias("priority"),
        )
        .withColumn("rank", F.row_number().over(w))
        # keep k+1: the extra row carries τ. The rank filter is what
        # Spark rewrites into WindowGroupLimit (partial per-map top-k).
        .filter(F.col("rank") <= k + 1)
    )
    tau = F.max(
        F.when(F.col("rank") == k + 1, F.col("priority"))
    ).over(Window.partitionBy(*part))
    return (
        ranked.withColumn("_tau", tau)
        .filter(F.col("rank") <= k)
        .select(
            *cols,
            "weight",
            "priority",
            F.col("rank").cast("long").alias("rank"),
            F.greatest(
                F.col("weight").cast("double"),
                F.coalesce(F.col("_tau"), F.lit(0.0)),
            ).alias("est_weight"),
        )
    )
