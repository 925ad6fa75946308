"""Data Selection via Importance Resampling (DSIR) — Xie et al. 2023
(arXiv:2302.03169), the standard targeted-data-selection primitive of an
LLM pretraining pipeline: score every raw document by how much more
likely it is under a *target* distribution than under the *raw*
distribution, both estimated as hashed-n-gram bag models, then keep the
top fraction.

Everything is engine-portable by construction:

* features are word BIGRAMS hashed into ``n_buckets`` buckets via the
  repo-standard 32-bit md5 prefix (identical in Spark `conv(hex,16,10)`
  and DuckDB `('0x'||hex)::BIGINT`);
* bucket log-probabilities are ``ln`` of INTEGER counts with add-lambda
  smoothing — deterministic per bucket;
* the only association-order float noise is the per-doc sum of
  ``c_b * diff_b`` (~1e-13 relative, far under the gate's 1e-6 canon);
* selection ranks by ``round(log_iw, 6)`` with doc_id tie-break, so the
  kept set is identical across engines whenever the scores hash-match.

Plan shape at 100 TB: one explode to (doc, bucket) rows, one
``n_buckets``-sized count aggregate per distribution (map-side partials,
then a broadcast join of the tiny bucket-diff table back onto the doc
features), one per-doc narrowing aggregate. Selection: the exact path is
a global rank window (test-scale only — documented); the scale path
(``method="approx"``) turns the quantile threshold into a
``percentile_approx`` scalar broadcast, so no global sort ever runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "dsir_doc_features",
    "dsir_log_weights",
    "dsir_select",
    "dsir_report_per_source",
]


def _bucket(gram, n_buckets: int):
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def dsir_doc_features(
    docs: DataFrame,
    n_buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashed word-bigram bag per document: (doc_id, b, c) with b the
    32-bit-md5 bucket of "w_i w_{i+1}" mod n_buckets."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )
    d = docs.select(
        F.col(id_col).alias("doc_id"), words.alias("_w"),
        F.size(words).alias("_n"),
    )
    grams = (
        d.filter(F.col("_n") >= 2)
        .select(
            "doc_id",
            # zip_with ladder: identical bigram strings, one linear pass
            F.explode(
                F.zip_with(
                    F.slice("_w", 1, F.col("_n") - 1),
                    F.slice("_w", 2, F.col("_n") - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                )
            ).alias("g"),
        )
    )
    return grams.groupBy(
        "doc_id", _bucket(F.col("g"), n_buckets).alias("b")
    ).agg(F.count("*").cast("long").alias("c"))


def dsir_log_weights(
    docs: DataFrame,
    target_filter,
    n_buckets: int = 256,
    lam: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-document DSIR log importance weight
    ``log_iw = Σ_b c_b · (log p_target(b) − log q_raw(b))`` with
    add-lambda smoothed hashed-bigram bucket models. ``target_filter``
    is a boolean Column selecting the target subset (e.g.
    ``F.col("lang") == "en"``). Docs with <2 words score 0.

    Returns (source, doc_id, n_feat, log_iw)."""
    feats = dsir_doc_features(docs, n_buckets, text_col, id_col)
    ids = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        target_filter.alias("_tgt"),
    )
    per_bucket = (
        feats.join(ids.select("doc_id", "_tgt"), "doc_id")
        .groupBy("b")
        .agg(
            F.sum("c").cast("long").alias("r_b"),
            F.sum(F.when(F.col("_tgt"), F.col("c")).otherwise(0))
            .cast("long").alias("t_b"),
        )
    )
    totals = per_bucket.agg(
        F.sum("r_b").cast("long").alias("r_tot"),
        F.sum("t_b").cast("long").alias("t_tot"),
    )
    diff = per_bucket.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            (F.log(F.col("t_b") + lam) - F.log(F.col("t_tot") + lam * n_buckets))
            - (F.log(F.col("r_b") + lam) - F.log(F.col("r_tot") + lam * n_buckets))
        ).alias("diff"),
    )
    per_doc = (
        feats.join(F.broadcast(diff), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_feat"),
            F.sum(F.col("c") * F.col("diff")).alias("log_iw"),
        )
    )
    return ids.select("doc_id", "source").join(per_doc, "doc_id", "left").select(
        "source",
        "doc_id",
        F.coalesce("n_feat", F.lit(0)).cast("long").alias("n_feat"),
        F.coalesce("log_iw", F.lit(0.0)).alias("log_iw"),
    )


def dsir_select(
    weights: DataFrame, frac: float = 0.25, method: str = "exact"
) -> DataFrame:
    """Mark the top ``frac`` of documents by log importance weight.

    ``method="exact"``: global rank over (round(log_iw,6) DESC, doc_id)
    — deterministic and engine-portable, but a single-partition window:
    test-scale only. ``method="approx"``: percentile_approx threshold
    broadcast as a scalar — the 100 TB path (kept-count is then
    approximate at the quantile boundary). Adds a ``selected`` column.
    """
    if method == "exact":
        w = Window.orderBy(
            F.round("log_iw", 6).desc(), F.col("doc_id").cast("string")
        )
        n = weights.count()
        quota = int(n * frac)
        return weights.withColumn(
            "selected", F.row_number().over(w) <= quota
        )
    if method == "approx":
        thr = weights.agg(
            F.percentile_approx("log_iw", 1.0 - frac, 10000).alias("thr")
        )
        return weights.crossJoin(F.broadcast(thr)).withColumn(
            "selected", F.col("log_iw") >= F.col("thr")
        ).drop("thr")
    raise ValueError("method must be 'exact' or 'approx'")


def dsir_report_per_source(
    docs: DataFrame,
    target_filter,
    n_buckets: int = 256,
    lam: float = 1.0,
    frac: float = 0.25,
    **kw,
) -> DataFrame:
    """Per-source DSIR audit: document count, mean log importance weight
    toward the target, docs scoring positive (closer to target than raw),
    and docs landing in the exact top-``frac`` global selection — the
    report that decides per-source sampling rates for a targeted mix."""
    wts = dsir_log_weights(docs, target_filter, n_buckets, lam, **kw)
    sel = dsir_select(wts, frac=frac, method="exact")
    return sel.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("log_iw").alias("mean_log_iw"),
        F.sum((F.col("log_iw") > 0).cast("long")).cast("long").alias("n_pos"),
        F.sum(F.col("selected").cast("long")).cast("long").alias("n_selected"),
    )
