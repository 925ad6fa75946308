"""Supervised text classification, fastText/CLD-style: a multinomial
Naive Bayes over HASHED character-bigram features (the classical
language-ID / domain-ID construction — Cavnar & Trenkle 1994 n-gram
profiles, feature hashing per Weinberger 2009). This is the trained
counterpart of the heuristic ``textops.lang_id``: fit on a labeled
corpus relationally (two aggregates), classify with one broadcast join —
no gradient loop, no Python in either path.

Engine-portable by construction (the relational-sketch conventions):
the feature bucket is ``conv(substring(md5(bigram),1,8),16,10) % B``
(DuckDB: ``('0x' || substr(md5(g),1,8))::BIGINT % B``), counts are exact
integers, every log's argument is an identical rational, and the argmax
ranks by ``round(score, 6)`` with the label as tie-break.

Scale shape: training reduces the corpus to a (label, bucket) count
table (≤ L·B rows) in one narrow shuffle; the completed model is
broadcast for classification, so the corpus-scale side never shuffles
anything wider than its per-doc bucket counts."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["nb_train", "nb_classify"]


def _bigram_buckets(df: DataFrame, text_col: str, n_buckets: int):
    """(rows…, b) — one row per char-bigram occurrence, hashed bucket."""
    grams = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.greatest(
                F.length(text_col) - 1, F.lit(0))),
            lambda i: F.col(text_col).substr(i, F.lit(2)),
        ),
        lambda g: F.length(g) == 2,
    )
    return df.select(
        "*", F.explode(grams).alias("_g")
    ).select(
        "*",
        (F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10).cast("long")
         % n_buckets).alias("b"),
    ).drop("_g")


def nb_train(
    labeled: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Fit the NB model. Returns the COMPLETED model relation — one row
    per (label, bucket) for every bucket observed under ANY label:

      (label, b, log_p, ln_prior, ln_unseen)

    where ``log_p = ln(c+α) − ln(T_label + α·B)`` (α-smoothed bucket
    likelihood), ``ln_prior = ln(n_docs_label / n_docs)``, and
    ``ln_unseen = ln(α) − ln(T_label + α·B)`` (the likelihood of any
    bucket outside the model — carried so classify can score unseen
    features exactly). Completion makes the model a dense L×B′ grid
    (B′ = observed buckets ≤ B), which is what lets classification be a
    single broadcast join."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    if alpha <= 0:
        raise ValueError("alpha must be positive")
    base = labeled.select(
        F.col(label_col).alias("label"), F.col(text_col).alias("_t")
    )
    toks = _bigram_buckets(base, "_t", n_buckets).select("label", "b")
    counts = toks.groupBy("label", "b").agg(
        F.count("*").cast("long").alias("c")
    )
    totals = counts.groupBy("label").agg(
        F.sum("c").cast("long").alias("t_label")
    )
    docs_per = base.groupBy("label").agg(
        F.count("*").cast("long").alias("n_docs_label")
    )
    n_docs = base.agg(F.count("*").cast("long").alias("n_docs"))
    # docs_per drives the label set (LEFT join): a label whose docs
    # yield zero bigram features (all texts length <= 1) still exists in
    # the model with t_label = 0 — its likelihoods are the pure-alpha
    # smoothed ones, not a silent disappearance from the classifier
    labels = (
        docs_per.join(totals, "label", "left")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "label",
            F.coalesce(F.col("t_label"), F.lit(0).cast("long"))
            .alias("t_label"),
            F.log(F.col("n_docs_label") / F.col("n_docs"))
            .alias("ln_prior"),
        )
    )
    buckets = counts.select("b").distinct()
    denom = F.log(F.col("t_label") + float(alpha) * n_buckets)
    return (
        labels.crossJoin(buckets)
        .join(counts, ["label", "b"], "left")
        .select(
            "label",
            "b",
            (F.log(F.coalesce(F.col("c"), F.lit(0).cast("long"))
                   + float(alpha)) - denom).alias("log_p"),
            "ln_prior",
            (F.log(F.lit(float(alpha))) - denom).alias("ln_unseen"),
        )
    )


def nb_classify(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Classify: full NB log-posterior per label —

      ``score = ln_prior + Σ_{b∈model} tf_b·log_p(b|label)
                + (N − Σ_{b∈model} tf_b) · ln_unseen``

    (the second term scores the doc's features outside the model, which
    is label-dependent through the denominator) — then argmax by
    ``(round(score,6) DESC, label ASC)``. ``n_buckets`` must match
    training. Returns (doc_id, label, score). Docs with no bigrams are
    scored on the prior alone.

    Plan: per-doc bucket tf (one narrow aggregate) joins the broadcast
    model; everything else is per-doc expressions."""
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    tf = (
        _bigram_buckets(base, "_t", n_buckets)
        .groupBy("doc_id", "b")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    per_doc = tf.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("n_feat")
    )
    scalars = model.select("label", "ln_prior", "ln_unseen").distinct()
    matched = (
        tf.join(F.broadcast(model.select("label", "b", "log_p")), "b")
        .groupBy("doc_id", "label")
        .agg(
            F.sum(F.col("tf") * F.col("log_p")).alias("m"),
            F.sum("tf").cast("long").alias("covered"),
        )
    )
    scored = (
        base.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(scalars))
        .join(matched, ["doc_id", "label"], "left")
        .select(
            "doc_id",
            "label",
            (
                F.col("ln_prior")
                + F.coalesce(F.col("m"), F.lit(0.0))
                + (
                    F.coalesce(F.col("n_feat"), F.lit(0).cast("long"))
                    - F.coalesce(F.col("covered"), F.lit(0).cast("long"))
                ) * F.col("ln_unseen")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc(F.round(F.col("score"), 6)), F.asc("label")
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "label", F.round("score", 6).alias("score"))
    )
