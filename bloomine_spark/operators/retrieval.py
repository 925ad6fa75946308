"""BM25 ranked retrieval over the documents table (Robertson–Spärck
Jones probabilistic relevance framework; the Okapi BM25 scoring function,
Robertson et al. TREC-3 1994) — the standard lexical search primitive a
corpus-analytics engine exposes next to its dedup/quality operators.

``score(d, q) = Σ_{t∈q} idf(t) · tf(t,d)·(k1+1) /
                        (tf(t,d) + k1·(1 − b + b·dl(d)/avgdl))``
with ``idf(t) = ln((N − df(t) + 0.5)/(df(t) + 0.5) + 1)`` (the
non-negative Lucene variant).

Engine-portable by construction: tf/df/dl/N are exact integers, avgdl is
one division of two integers, idf is ln of identical rationals, and
ranking orders by ``round(score, 6)`` with doc_id as tie-break — the
same convention as dsir.py, so the result set is identical across
engines whenever the scores hash-match.

Plan shape at 100 TB: the token explode is filtered to the QUERY TERMS
(a broadcast literal set) before anything aggregates, so the corpus-
scale relation is |terms|-bounded per doc; df/N/avgdl are tiny scalar
or per-term aggregates broadcast back; per-source top-k is a rank
window AFTER the score aggregate (scored docs only — docs sharing no
query term never enter the plan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["bm25_topk_per_source"]


def bm25_topk_per_source(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Top-``k`` BM25 hits per source for a bag-of-words query.

    Returns (source, doc_id, score, rank) with score rounded to 1e-6
    and rank 1-based per source (ties broken by doc_id as a string)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    words = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        words.alias("_w"),
        F.size(F.filter(words, lambda x: x != F.lit("")))
        .cast("long").alias("dl"),
    )
    stats = base.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    tok = base.select(
        "source", "doc_id", "dl", F.explode("_w").alias("t")
    ).filter(F.col("t").isin(*query_terms))
    tf = tok.groupBy("source", "doc_id", "dl", "t").agg(
        F.count("*").cast("long").alias("tf")
    )
    df_t = tf.groupBy("t").agg(
        F.count("*").cast("long").alias("df")
    )
    scored = (
        tf.join(F.broadcast(df_t), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "source",
            "doc_id",
            (
                F.log(
                    (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                    + 1.0
                )
                * (F.col("tf") * (k1 + 1.0))
                / (
                    F.col("tf")
                    + k1
                    * (
                        1.0
                        - b
                        + b
                        * F.col("dl")
                        / (F.col("sum_dl") / F.col("n_docs"))
                    )
                )
            ).alias("part"),
        )
        .groupBy("source", "doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.col("doc_id").cast("string")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )
