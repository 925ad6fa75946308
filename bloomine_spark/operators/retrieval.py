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

__all__ = [
    "bm25_topk_per_source",
    "tfidf_cosine_topk_per_source",
    "ql_dirichlet_topk_per_source",
    "phrase_search",
]


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


def ql_dirichlet_topk_per_source(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 5,
    mu: float = 2000.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Top-``k`` Dirichlet-smoothed query-likelihood hits per source
    (Zhai & Lafferty SIGIR 2001 — the other canonical lexical ranker,
    the LM counterpart of BM25):

    ``score(q,d) = Σ_{t∈q} qtf_t · ln((tf(t,d) + μ·p(t|C)) / (dl + μ))``

    with the collection model ``p(t|C) = ctf(t)/|C|``. Every document
    gets a score (unmatched terms contribute the background mass), so
    the naive relation is |vocab|-scale; we use the exact decomposition

    ``score = Σ_{t∈q∩d} qtf·ln(1 + tf/(μ·p_t))
              + Σ_{t∈q} qtf·ln(μ·p_t)  −  |q|·ln(dl + μ)``

    whose first sum ranges only over MATCHED (doc, term) pairs, the
    middle term is one broadcast scalar, and the last is a per-doc map
    on ``dl`` — the corpus-scale part of the plan is identical to
    BM25's query-term-bounded explode plus one narrow (doc, dl)
    relation for the unmatched-doc tail. Query terms with zero corpus
    frequency have no likelihood under the collection model and are
    dropped (the standard convention).

    Engine-portable like BM25: tf/ctf/dl/|C| are exact integers, the
    two ln arguments are identical rationals, ranking orders by
    ``round(score, 6)`` then doc_id-as-string. Returns
    (source, doc_id, score, rank)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if mu <= 0:
        raise ValueError("mu must be positive")
    qtf: dict[str, int] = {}
    for t in query_terms:
        qtf[t] = qtf.get(t, 0) + 1
    terms = sorted(qtf)
    words = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        words.alias("_w"),
        F.size(F.filter(words, lambda x: x != F.lit("")))
        .cast("long").alias("dl"),
    )
    stats = base.agg(F.sum("dl").cast("long").alias("c_len"))
    tok = base.select(
        "source", "doc_id", F.explode("_w").alias("t")
    ).filter(F.col("t").isin(*terms))
    tf = tok.groupBy("source", "doc_id", "t").agg(
        F.count("*").cast("long").alias("tf")
    )
    ctf = tf.groupBy("t").agg(F.sum("tf").cast("long").alias("ctf"))
    # matched part: Σ qtf·ln(1 + tf·|C| / (μ·ctf))
    qtf_expr = F.create_map(
        *[x for t in terms for x in (F.lit(t), F.lit(qtf[t]))]
    )
    matched = (
        tf.join(F.broadcast(ctf), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            "source",
            "doc_id",
            (
                qtf_expr[F.col("t")].cast("double")
                * F.log(
                    1.0
                    + F.col("tf") * F.col("c_len")
                    / (F.lit(float(mu)) * F.col("ctf"))
                )
            ).alias("part"),
        )
        .groupBy("source", "doc_id")
        .agg(F.sum("part").alias("m"))
    )
    # doc-independent scalar Σ qtf·ln(μ·ctf/|C|) and query length |q|,
    # over terms present in the corpus only
    const = (
        ctf.crossJoin(F.broadcast(stats))
        .agg(
            F.sum(
                qtf_expr[F.col("t")].cast("double")
                * F.log(F.lit(float(mu)) * F.col("ctf") / F.col("c_len"))
            ).alias("c_q"),
            F.sum(qtf_expr[F.col("t")]).cast("long").alias("q_len"),
        )
    )
    scored = (
        base.select("source", "doc_id", "dl")
        .join(matched, ["source", "doc_id"], "left")
        .crossJoin(F.broadcast(const))
        .select(
            "source",
            "doc_id",
            F.round(
                F.coalesce(F.col("m"), F.lit(0.0))
                + F.coalesce(F.col("c_q"), F.lit(0.0))
                + F.coalesce(-F.col("q_len"), F.lit(0.0))
                * F.log(F.col("dl") + F.lit(float(mu))),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.col("doc_id").cast("string")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def phrase_search(
    docs: DataFrame,
    phrases: list[str],
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase search via positional postings intersection — the
    relational form of a positional inverted index's phrase query
    (Manning IR §2.4.2): ``(phrase, doc_id, n_occurrences, first_pos)``
    for every document containing each phrase as a contiguous word run.

    Plan at 100 TB: the positional explode is filtered to the phrase
    VOCABULARY before anything shuffles (docs sharing no phrase word
    never enter the plan), the phrase-word relation is a broadcast
    literal, and an occurrence is one groupBy on (phrase, doc, start):
    posting ``(doc, pos, w)`` matched at offset ``i`` proposes start
    ``pos − i``, and a start with all ``len(phrase)`` offsets present is
    a match — no per-word self-join chain, ONE aggregation regardless of
    phrase length. Repeated words inside a phrase are handled naturally
    (each posting row proposes one start per offset the word occupies).
    """
    if not phrases:
        raise ValueError("phrases must be non-empty")
    spark = docs.sparkSession
    rows = []
    for pid, ph in enumerate(phrases):
        ws = ph.split(" ")
        if not ws or any(not w for w in ws):
            raise ValueError(f"bad phrase: {ph!r}")
        rows.extend((pid, ph, len(ws), i, w) for i, w in enumerate(ws))
    pw = spark.createDataFrame(rows, ["phrase_id", "phrase", "k", "i", "w"])
    vocab = sorted({r[4] for r in rows})

    postings = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w"),
    ).filter(F.col("w").isin(vocab))
    cand = postings.join(F.broadcast(pw), "w").select(
        "phrase_id", "phrase", "k", "doc_id",
        (F.col("pos") - F.col("i")).alias("start"),
    )
    hits = (
        cand.filter(F.col("start") >= 0)
        .groupBy("phrase_id", "phrase", "k", "doc_id", "start")
        .agg(F.count("*").alias("n_off"))
        .filter(F.col("n_off") == F.col("k"))
    )
    return hits.groupBy("phrase", "doc_id").agg(
        F.count("*").alias("n_occurrences"),
        F.min("start").alias("first_pos"),
    )


def tfidf_cosine_topk_per_source(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Top-``k`` SMART lnc.ltc TF-IDF cosine hits per source (Salton &
    Buckley 1988; the vector-space ranker beside BM25 and Dirichlet QL):
    document vectors are log-tf with NO idf, cosine-normalized over the
    document's FULL vocabulary; the query vector is log-tf·idf with
    ``idf = ln(N/df)``, normalized once. Query terms absent from the
    corpus drop out of the query vector (df=0 has no idf), the standard
    convention.

    ``score(d,q) = Σ_{t∈q∩d} (1+ln tf_{t,d})/‖d‖ · idf_t/‖q‖``

    Honest cost note vs BM25: cosine needs ``‖d‖`` over every term of
    every doc, so ONE corpus-wide (doc, term) count aggregate is
    unavoidable — but it collapses immediately to a per-doc scalar
    (narrow (doc, double) relation), and everything query-dependent
    stays |terms|-bounded: matched tf joins the norm relation on the
    doc key, df/N/query-norm are broadcast scalars. Ranking orders by
    ``round(score, 6)`` with doc_id tie-break (the dsir.py portability
    convention).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    if len(set(query_terms)) != len(query_terms):
        raise ValueError("query_terms must be distinct (qtf folds in)")
    words = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(source_col).alias("source"),
        F.col(id_col).alias("doc_id"),
        words.alias("_w"),
    )
    tf_all = (
        base.select("source", "doc_id", F.explode("_w").alias("t"))
        .filter(F.col("t") != "")
        .groupBy("source", "doc_id", "t")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    wgt = F.lit(1.0) + F.log("tf")
    norms = tf_all.groupBy("source", "doc_id").agg(
        F.sqrt(F.sum(wgt * wgt)).alias("dnorm")
    )
    stats = base.agg(F.count("*").cast("long").alias("n_docs"))
    tf_q = tf_all.filter(F.col("t").isin(*query_terms))
    df_t = tf_q.groupBy("t").agg(F.count("*").cast("long").alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats)).select(
        "t", F.log(F.col("n_docs") / F.col("df")).alias("idf")
    )
    qnorm = idf.agg(
        F.sqrt(F.sum(F.col("idf") * F.col("idf"))).alias("qnorm")
    )
    scored = (
        tf_q.join(F.broadcast(idf), "t")
        .join(norms, ["source", "doc_id"])
        .crossJoin(F.broadcast(qnorm))
        .groupBy("source", "doc_id")
        .agg(
            F.round(
                F.sum(
                    (F.lit(1.0) + F.log("tf")) / F.col("dnorm")
                    # ANSI guard: qnorm 0 (all-zero idf) must yield
                    # NULL -> filtered, not DIVIDE_BY_ZERO
                    * F.when(F.col("qnorm") != 0,
                             F.col("idf") / F.col("qnorm"))
                ),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("score"), F.col("doc_id").cast("string")
    )
    return (
        # a query whose every term spans the whole corpus has idf 0 for
        # all of it -> qnorm 0 -> NULL scores; such a query carries no
        # ranking signal, so the contract is an EMPTY result rather
        # than k arbitrary NULL-scored docs (review finding)
        scored.filter(F.col("score").isNotNull())
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )
