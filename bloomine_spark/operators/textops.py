"""Text-analysis operators for training-data pipelines.

Everything here is pure built-in Spark expressions (JVM-side, whole-stage
codegen) — language-ID heuristic, quality scoring, token counting, document
fingerprinting. The rolling-hash/winnowing fingerprint is the one numpy
kernel (hash-based, pytest-gated rather than SQL-oracled).
"""

from __future__ import annotations

from typing import Iterator

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bloomine_spark.functions.hashing import rolling_kgram_hash

# marker stopwords per language for the heuristic language-ID
_LANG_MARKERS = {
    "en": ["the", "a", "of", "and"],
}


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count per doc."""
    words = F.split(F.col(text_col), " ")
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(words).alias("n_ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
        .alias("n_re_tokens"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + composite score.

    length, mean word length, stopword ratio, punctuation ratio — the
    standard cheap quality signals, all codegen expressions.
    """
    words = F.split(F.col(text_col), " ")
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    stop = F.size(
        F.filter(words, lambda w: w.isin(*_LANG_MARKERS["en"]))
    )
    punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?]", ""))
    mean_wlen = (n_chars - (n_words - 1)) / n_words
    stop_ratio = stop / n_words
    punct_ratio = punct / F.greatest(n_chars, F.lit(1))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(
            F.least(n_words / F.lit(100.0), F.lit(1.0)) * 0.5
            + stop_ratio * 0.3
            + (1 - punct_ratio) * 0.2,
            4,
        ).alias("quality"),
    )


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-stopword language heuristic: docs carrying English marker
    words → 'en', else 'other'; emitted next to the labeled lang column so
    accuracy is queryable."""
    words = F.split(F.col(text_col), " ")
    n_markers = F.size(F.filter(words, lambda w: w.isin(*_LANG_MARKERS["en"])))
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.col("lang").alias("labeled_lang"),
        F.when(n_markers > 0, F.lit("en")).otherwise(F.lit("other")).alias(
            "predicted_lang"
        ),
    )


def fingerprint_md5(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact content fingerprint (md5 of normalized text)."""
    return docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("fingerprint"),
    )


def fingerprint_winnow(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 4,
    window: int = 8,
) -> DataFrame:
    """Winnowing fingerprint (Schleimer et al. 2003): rolling k-gram hashes
    over word-token ids, min-sampled per window → per-doc distinct
    fingerprint set, plus a single min-hash summary. Content-defined, so
    shared passages between docs produce shared fingerprints."""
    pre = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.transform(F.split(F.col(text_col), " "), lambda w: F.xxhash64(w)).alias(
            "_wh"
        ),
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("fingerprints", T.ArrayType(T.LongType())),
            T.StructField("min_fp", T.LongType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fps, mins = [], [], []
            for doc_id, wh in zip(pdf["doc_id"], pdf["_wh"]):
                h = np.asarray(wh, dtype=np.uint64)
                nw = len(h) - k + 1
                if nw <= 0:
                    continue
                kh = rolling_kgram_hash(h, nw, k)
                if len(kh) >= window:
                    win = np.lib.stride_tricks.sliding_window_view(kh, window)
                    sel = np.unique(win.min(axis=1))
                else:
                    sel = np.array([kh.min()], dtype=np.uint64)
                ids.append(doc_id)
                sel64 = sel.astype(np.int64)
                fps.append(sel64)
                # min in the SIGNED domain so min_fp == array_min(fingerprints)
                # even when a uint64 hash ≥ 2^63 wraps negative
                mins.append(int(sel64.min()))
            if ids:
                yield pd.DataFrame(
                    {"doc_id": ids, "fingerprints": fps, "min_fp": mins}
                )

    return pre.mapInPandas(kernel, schema=schema)


def fingerprint_winnow_sql(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 4,
    window: int = 8,
) -> DataFrame:
    """Winnowing with SQL-PORTABLE hashes: k-gram hash = first 16 hex
    chars of md5, window minima and dedup all as Catalyst expressions —
    the entire operator is whole-stage codegen, zero Python, and every
    fingerprint is bit-reproducible by any engine with md5 (the DuckDB
    oracle hash-checks it end to end). Companion to fingerprint_winnow
    (numpy rolling hash — faster per byte, but its hash is private to
    this library so no external oracle can recompute it).

    Returns (doc_id, fingerprints sorted array<string>, n_fingerprints,
    min_fp) for docs with ≥ k words; the scheme is Schleimer et al. 2003
    winnowing with lexicographic-min selection over hex strings (uniform
    hash, so min-over-hex is the same sampling rule as min-over-int)."""
    words = F.split(F.col(text_col), " ")
    kg = F.when(
        F.size(words) >= k,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - k),
            lambda i: F.substring(
                F.md5(F.concat_ws(" ", F.slice(words, i + 1, k))), 1, 16
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    pre = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"), kg.alias("_kh")
    ).filter(F.size("_kh") > 0)
    wins = F.when(
        F.size("_kh") >= window,
        F.transform(
            F.sequence(F.lit(0), F.size("_kh") - window),
            lambda j: F.array_min(F.slice(F.col("_kh"), j + 1, window)),
        ),
    ).otherwise(F.array(F.array_min(F.col("_kh"))))
    return (
        pre.select(
            "doc_id",
            F.array_sort(F.array_distinct(wins)).alias("fingerprints"),
        )
        .withColumn("n_fingerprints", F.size("fingerprints"))
        .withColumn("min_fp", F.element_at("fingerprints", 1))
    )


# PII patterns kept deliberately simple and ANSI-regex portable: the SAME
# pattern strings run in Spark's regexp_replace and DuckDB's (oracle), so
# the scrub is hash-checkable end-to-end. Order matters: emails first
# (an email contains digit runs a phone pattern could bite).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Replace emails / IPv4s / phone-shaped digit runs with typed tags and
    count replacements per doc — the standard curation scrub before
    training. Pure built-in expressions (regexp_replace / regexp_count),
    whole-stage codegen, no shuffle: columnar-scan cost only at any scale.

    Returns (doc_id, clean_text, n_email, n_ipv4, n_phone).
    """
    cleaned = F.col(text_col)
    counts = {}
    for name, pat in PII_PATTERNS:
        counts[name] = F.regexp_count(cleaned, F.lit(pat))
        cleaned = F.regexp_replace(cleaned, pat, f"<{name.upper()}>")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        cleaned.alias("clean_text"),
        *[counts[n].cast("long").alias(f"n_{n}") for n, _ in PII_PATTERNS],
    )


def repetition_scores(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Intra-document repetition metrics (Gopher-style quality rules,
    Rae et al. 2021 §A1.1): the fraction of all word 2-grams taken by the
    single most frequent 2-gram, plus the distinct/total 2-gram ratio.
    High top-fraction == boilerplate/looping text a curation pass drops.
    Pure built-in expressions over an exploded 2-gram view — one narrow
    (doc_id, gram) shuffle, exactly SQL-mirrorable for the oracle.

    Returns (doc_id, n_2grams, top_2gram_count, top2_frac, distinct_frac).
    """
    words = F.split(F.col(text_col), " ")
    # zip_with against the array's own shift: byte-identical 2-gram
    # strings to the old per-index slice+concat_ws transform at a
    # fraction of the expression work (see dedup._word_shingles_expr)
    grams = F.when(
        F.size(words) >= 2,
        F.zip_with(
            F.slice(words, 1, F.size(words) - 1),
            F.slice(words, 2, F.size(words) - 1),
            lambda x, y: F.concat(x, F.lit(" "), y),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = docs.select(F.col(id_col).alias("doc_id"),
                    F.explode(grams).alias("gram"))
    per_gram = g.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
    return (
        per_gram.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_2grams"),
            F.max("c").cast("long").alias("top_2gram_count"),
            F.count("*").cast("long").alias("n_distinct_2grams"),
        )
        .select(
            "doc_id", "n_2grams", "top_2gram_count",
            F.round(F.col("top_2gram_count") / F.col("n_2grams"), 6)
            .alias("top2_frac"),
            F.round(F.col("n_distinct_2grams") / F.col("n_2grams"), 6)
            .alias("distinct_frac"),
        )
    )


def unigram_logprob_per_source(
    docs: DataFrame, text_col: str = "text", source_col: str = "source",
) -> DataFrame:
    """CCNet-style perplexity filtering signal (Wenzek et al. 2020),
    with the LM reduced to the corpus's own unigram model so the whole
    computation stays in-engine: per document,
    ``nll = ln(N) − mean(ln(freq(t)))`` (the mean negative log
    probability under p(t) = freq(t)/N), then per source the mean doc
    NLL and its exp (the source's unigram perplexity). Low-NLL sources
    are boilerplate-heavy; high-NLL sources are noisy — the same
    triage CCNet does with a KenLM model.

    Plan shape at 100 TB: one token-count aggregate (vocab-sized
    output), its total broadcast as a scalar, one token→freq join
    (AQE broadcasts the vocab while it fits, shuffle join beyond), and
    two narrowing aggregates (doc, then source). The transcendentals
    are per-TYPE ln() calls inside codegen — no Python anywhere."""
    tok = (
        docs.select(
            F.col(source_col).alias("source"),
            F.col("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    freq = tok.groupBy("t").agg(F.count("*").cast("long").alias("c"))
    total = freq.agg(F.sum("c").cast("long").alias("n_total"))
    per_doc = (
        tok.join(freq, "t")
        .crossJoin(F.broadcast(total))
        .groupBy("source", "doc_id")
        .agg(
            (F.log(F.first("n_total")) - F.avg(F.log("c"))).alias("nll")
        )
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("nll").alias("mean_doc_nll"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


def bigram_doc_nll(
    docs: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Per-document mean bigram NLL under the corpus's own add-k
    smoothed bigram model — the shared scoring head of
    ``bigram_logprob_per_source`` (per-source triage) and
    ``ccnet_ppl_buckets`` (per-doc head/middle/tail split). Returns
    (source, doc_id, nll) for every doc with ≥2 non-empty tokens.

    Plan shape at 100 TB: one bigram-count aggregate (the LM — bounded
    by observed bigram types), context counts derived FROM that relation
    by one more groupBy (no second corpus scan), V and the scalar join
    broadcast, then one bigram→prob join and one narrowing aggregate.
    ln() stays per-TYPE inside codegen; association noise ~1e-11, far
    under the gate's 1e-6 canon."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )
    d = docs.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        words.alias("_w"),
        F.size(words).alias("_n"),
    )
    big = (
        d.filter(F.col("_n") >= 2)
        .select(
            "source",
            "doc_id",
            # zip_with of the word array against its own shift — the same
            # (w1, w2) pairs as the old per-index element_at transform at
            # one linear pass (see dedup._word_shingles_expr)
            F.explode(
                F.zip_with(
                    F.slice("_w", 1, F.col("_n") - 1),
                    F.slice("_w", 2, F.col("_n") - 1),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("b"),
        )
        .select("source", "doc_id", F.col("b.w1").alias("w1"),
                F.col("b.w2").alias("w2"))
    )
    bfreq = big.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("cb")
    )
    ctx = bfreq.groupBy("w1").agg(F.sum("cb").cast("long").alias("cw"))
    tok = d.select(F.explode("_w").alias("t"))
    vsize = tok.agg(
        F.count_distinct("t").cast("long").alias("v")
    )
    lm = (
        bfreq.join(ctx, "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w1", "w2",
            (F.log(F.col("cb") + k)
             - F.log(F.col("cw") + k * F.col("v"))).alias("lp"),
        )
    )
    per_doc = _doc_mean_lp(big, lm)
    return per_doc


def _doc_mean_lp(big: DataFrame, lm: DataFrame) -> DataFrame:
    """(source, doc_id, nll) = −mean(lp) over a doc's bigram occurrences.

    Kept as a direct occurrence→LM join: with runtime-size broadcast
    planning the LM lands on the broadcast side whenever it fits, so the
    occurrence stream never shuffles for the join and the per-doc
    aggregate's map-side combine collapses it before its one exchange. A
    pre-aggregation to per-doc bigram TYPES was measured here and
    REJECTED: it inserts a full (source, doc_id, w1, w2) exchange that
    costs more than the join probes it saves (guide §1: measure, don't
    assume)."""
    return (
        big.join(lm, ["w1", "w2"])
        .groupBy("source", "doc_id")
        .agg((-F.avg("lp")).alias("nll"))
    )


def kneser_ney_ppl_per_source(
    docs: DataFrame,
    discount: float = 0.75,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Interpolated Kneser–Ney bigram perplexity per source — the
    smoothing the CCNet-style LM filter actually uses (KenLM's default;
    Chen & Goodman 1998 eq. 20 at n=2 with one fixed discount ``D``):

        P(w2|w1) = max(c(w1,w2) − D, 0)/c(w1,·)
                 + D·N1+(w1,·)/c(w1,·) · N1+(·,w2)/N1+(·,·)

    where N1+(w1,·) is the number of distinct continuations of w1,
    N1+(·,w2) the number of distinct contexts preceding w2 (the
    continuation probability — "how promiscuous is w2", not "how
    frequent"), and N1+(·,·) the total number of bigram types. Unlike
    ``bigram_logprob_per_source``'s add-k model this never lets a
    frequent-but-rigid word (one that only ever follows one context)
    soak up backoff mass — the classic "San Francisco" correction.
    Documents with <2 non-empty tokens have no bigrams and are excluded.

    Every quantity derives from the distinct-bigram relation alone:
    c(w1,·) and N1+(w1,·) from one groupBy(w1), N1+(·,w2) from one
    groupBy(w2), N1+(·,·) a 1-row broadcast scalar. The corpus is
    scanned once for bigrams; the corpus is its own LM, so every scored
    bigram is observed and ``cb − D > 0`` always holds (no max() branch
    materializes). Plan shape at 100 TB: bigram agg → two vocab-bounded
    derived aggs → LM join → two narrowing aggregates, ln() per TYPE
    inside codegen.
    """
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )
    d = docs.select(
        F.col(source_col).alias("source"),
        F.col("doc_id"),
        words.alias("_w"),
        F.size(words).alias("_n"),
    )
    big = (
        d.filter(F.col("_n") >= 2)
        .select(
            "source",
            "doc_id",
            # zip_with of the word array against its own shift — the same
            # (w1, w2) pairs as the old per-index element_at transform at
            # one linear pass (see dedup._word_shingles_expr)
            F.explode(
                F.zip_with(
                    F.slice("_w", 1, F.col("_n") - 1),
                    F.slice("_w", 2, F.col("_n") - 1),
                    lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
                )
            ).alias("b"),
        )
        .select("source", "doc_id", F.col("b.w1").alias("w1"),
                F.col("b.w2").alias("w2"))
    )
    bfreq = big.groupBy("w1", "w2").agg(
        F.count("*").cast("long").alias("cb")
    )
    # one pass over the (distinct) bigram relation per marginal:
    # context count AND distinct-continuation count share a groupBy
    ctx = bfreq.groupBy("w1").agg(
        F.sum("cb").cast("long").alias("cw"),
        F.count("*").cast("long").alias("nf"),
    )
    cont = bfreq.groupBy("w2").agg(
        F.count("*").cast("long").alias("nb")
    )
    btypes = bfreq.agg(F.count("*").cast("long").alias("bt"))
    lm = (
        bfreq.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            "w1", "w2",
            F.log(
                (F.col("cb") - discount) / F.col("cw")
                + discount * F.col("nf") / F.col("cw")
                * F.col("nb") / F.col("bt")
            ).alias("lp"),
        )
    )
    per_doc = _doc_mean_lp(big, lm)
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("nll").alias("mean_doc_nll"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


def bigram_logprob_per_source(
    docs: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Bigram-LM perplexity triage — the next refinement of
    ``unigram_logprob_per_source``: per document the mean bigram NLL
    under the corpus's own add-k model
    ``P(w2|w1) = (c(w1,w2) + k) / (c(w1,·) + k·V)`` (see
    :func:`bigram_doc_nll` for the scoring head and its 100 TB plan
    shape), per source the mean doc NLL and its exp. Documents with
    <2 non-empty tokens have no bigrams and are excluded (n_docs
    counts scored docs only)."""
    per_doc = bigram_doc_nll(docs, k, text_col, source_col)
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("nll").alias("mean_doc_nll"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


def ccnet_ppl_buckets(
    docs: DataFrame,
    k: float = 0.5,
    n_buckets: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): within each
    source, rank documents by LM perplexity and cut into ``n_buckets``
    equal-count bands — head = lowest-perplexity third (cleanest text,
    what CCNet ships as its best slice), tail = highest. The LM here is
    the corpus's own add-k bigram model (:func:`bigram_doc_nll`), the
    same reduction the other in-engine perplexity ops use in place of
    CCNet's external KenLM.

    Ranking is engine-portable by construction: order by
    ``(round(nll, 6), doc_id)`` and cut with INTEGER arithmetic
    ``bucket = (n_buckets·(rank−1)) div n`` — no float boundary can
    move a document across engines. Returns one row per
    (source, bucket): n_docs, mean_doc_nll, ppl.

    Plan shape at 100 TB: the scoring head's aggregates, then ONE
    per-source window over (nll, doc_id) — the window shuffle carries
    only (source, doc_id, nll), not text. CCNet itself shards this per
    language; partitionBy(source) is exactly that sharding."""
    per_doc = bigram_doc_nll(docs, k, text_col, source_col)
    w = Window.partitionBy("source").orderBy(
        F.round("nll", 6).asc(), F.col("doc_id").asc()
    )
    n = Window.partitionBy("source")
    names = F.array(
        *[
            F.lit(
                "head" if i == 0
                else ("tail" if i == n_buckets - 1 else f"mid{i}")
            )
            for i in range(n_buckets)
        ]
    ) if n_buckets != 3 else F.array(
        F.lit("head"), F.lit("middle"), F.lit("tail")
    )
    bucketed = per_doc.select(
        "source",
        "nll",
        F.element_at(
            names,
            (
                (F.lit(n_buckets) * (F.row_number().over(w) - 1))
                .cast("long")
                / F.count("*").over(n)
            ).cast("long").cast("int") + 1,
        ).alias("bucket"),
    )
    return bucketed.groupBy("source", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("nll").alias("mean_doc_nll"),
        F.exp(F.avg("nll")).alias("ppl"),
    )


#: Gopher rule-pack stop-word set (Rae et al. 2021, table A1 — public).
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style quality-filter rule pack (Rae et al. 2021 — the
    standard pretraining corpus gate; same family as C4/RefinedWeb):
    per document, pass/fail for
      word_count     min_words ≤ n_words ≤ max_words
      mean_word_len  min_mean_len ≤ mean ≤ max_mean_len
      symbol_ratio   (# chars + '...' occurrences) / n_words ≤ 0.1
      alpha_words    words containing a letter / n_words ≥ 0.8
      stop_words     ≥ min_stopwords distinct words from the Gopher set
    plus the conjunction ``keep``.

    Every ratio rule is evaluated as an INTEGER cross-multiplication
    (e.g. mean-length bounds become ``3·n ≤ total_chars ≤ 10·n``), so
    the output is exact and engine-portable — no float thresholds.
    Pure codegen expressions; at 100 TB this is a map over the scan."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != F.lit("")
    )
    d = docs.select(
        "*",
        words.alias("_w"),
        F.size(words).cast("long").alias("_nw"),
    ).select(
        "*",
        F.aggregate(
            "_w", F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        ).alias("_chars"),
        F.size(
            F.filter("_w", lambda x: x.rlike("[A-Za-z]"))
        ).cast("long").alias("_alpha"),
        F.size(
            F.array_intersect(
                F.array_distinct("_w"),
                F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            )
        ).cast("long").alias("_stop"),
        (
            (F.length(text_col) - F.length(F.replace(text_col, F.lit("#"))))
            + (
                F.length(text_col)
                - F.length(F.replace(text_col, F.lit("...")))
            ) / F.lit(3)
        ).cast("long").alias("_sym"),
    )
    return d.select(
        *docs.columns,
        ((F.col("_nw") >= min_words) & (F.col("_nw") <= max_words))
        .alias("pass_word_count"),
        (
            (F.col("_chars") >= min_mean_len * F.col("_nw"))
            & (F.col("_chars") <= max_mean_len * F.col("_nw"))
        ).alias("pass_mean_word_len"),
        (F.col("_sym") * 10 <= F.col("_nw")).alias("pass_symbol_ratio"),
        (F.col("_alpha") * 5 >= F.col("_nw") * 4).alias("pass_alpha_words"),
        (F.col("_stop") >= min_stopwords).alias("pass_stop_words"),
    ).withColumn(
        "keep",
        F.col("pass_word_count")
        & F.col("pass_mean_word_len")
        & F.col("pass_symbol_ratio")
        & F.col("pass_alpha_words")
        & F.col("pass_stop_words"),
    )


def gopher_quality_per_source(
    docs: DataFrame, text_col: str = "text", source_col: str = "source",
    **rules,
) -> DataFrame:
    """Per-source rule-pack report: how many documents each Gopher rule
    rejects and how many survive the conjunction — the filtering audit a
    curation run logs before committing a corpus. Pure integer counts
    (hash-exact); one partial-agg shuffle over ≤ |sources| rows."""
    flagged = gopher_quality(docs, text_col=text_col, **rules)

    def fails(c):
        return F.sum((~F.col(c)).cast("long")).alias(c.replace("pass_", "fail_"))

    return flagged.groupBy(F.col(source_col).alias("source")).agg(
        F.count("*").cast("long").alias("n_docs"),
        fails("pass_word_count"),
        fails("pass_mean_word_len"),
        fails("pass_symbol_ratio"),
        fails("pass_alpha_words"),
        fails("pass_stop_words"),
        F.sum(F.col("keep").cast("long")).cast("long").alias("n_kept"),
    )


#: C4 blocklist stand-in (Raffel et al. 2020 use the public "List of
#: Dirty, Naughty…" list; ship a tiny default and take the real list as
#: a parameter — the rule is the mechanism, not the wordlist).
C4_BLOCKLIST = ("badword1", "badword2")


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = C4_BLOCKLIST,
) -> DataFrame:
    """The C4 cleaning rule pack (Raffel et al. 2020 §2.2 — the rules
    that built the most-reused pretraining corpus):

    line level (a line = ``\\n``-separated):
      * keep only lines ending in terminal punctuation (``. ! ? "``)
      * keep only lines with ≥ ``min_words_per_line`` words
      * drop any line containing the word "javascript" (any case)
    page level (evaluated on the kept lines):
      * drop pages with fewer than ``min_sentences`` sentences
        (terminal-punctuation marks in the kept text)
      * drop pages containing any blocklist word
      * drop pages containing the phrase "lorem ipsum"
      * drop pages containing a curly bracket

    Returns one row per doc: (…id cols…, text = the rebuilt page,
    n_lines_kept, n_lines_dropped, n_sentences, page_keep, reason —
    the FIRST failing page rule in the order above, NULL when kept).

    Everything is pure codegen (split / filter-lambda / rlike /
    length-difference counting) — at 100 TB this is a map over the
    scan with no shuffle, the same shape as the Gopher pack. The
    sentence counter is ``length(kept) − length(replace(kept, mark))``
    summed over the three marks: exact, no regex engine variance.
    """
    lines = F.split(F.col(text_col), "\n")
    kept_lines = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$')
        & (F.size(F.filter(F.split(l, " "), lambda x: x != F.lit("")))
           >= min_words_per_line)
        & ~F.lower(l).contains("javascript"),
    )
    d = docs.select(
        "*",
        F.size(lines).cast("long").alias("_nl"),
        kept_lines.alias("_kl"),
    ).select(
        "*",
        F.concat_ws("\n", "_kl").alias("_kept"),
    )
    n_sent = sum(
        F.length("_kept") - F.length(F.replace(F.col("_kept"), F.lit(m)))
        for m in (".", "!", "?")
    ).cast("long")
    low = F.lower(F.col("_kept"))
    fail_sent = n_sent < min_sentences
    fail_block = F.lit(False)
    for w in blocklist:
        fail_block = fail_block | low.contains(w.lower())
    fail_lorem = low.contains("lorem ipsum")
    fail_curly = F.col("_kept").contains("{")
    reason = (
        F.when(fail_sent, F.lit("too_few_sentences"))
        .when(fail_block, F.lit("blocklist"))
        .when(fail_lorem, F.lit("lorem_ipsum"))
        .when(fail_curly, F.lit("curly_brace"))
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return d.select(
        *out_cols,
        F.col("_kept").alias(text_col),
        F.size("_kl").cast("long").alias("n_lines_kept"),
        (F.col("_nl") - F.size("_kl")).cast("long").alias("n_lines_dropped"),
        n_sent.alias("n_sentences"),
        reason.isNull().alias("page_keep"),
        reason.alias("reason"),
    )


REFINEDWEB_NAV_WORDS = (
    "home", "menu", "login", "register", "share", "print", "subscribe",
)
REFINEDWEB_COUNTER_WORDS = (
    "likes", "comments", "shares", "views", "retweets", "followers",
)


def refinedweb_line_correct(
    docs: DataFrame,
    text_col: str = "text",
    max_removed_pct: int = 50,
    nav_words: tuple[str, ...] = REFINEDWEB_NAV_WORDS,
    counter_words: tuple[str, ...] = REFINEDWEB_COUNTER_WORDS,
) -> DataFrame:
    """RefinedWeb line-wise corrections (Penedo et al. 2023, Appendix
    G.2 — the boilerplate scrubber applied after trafilatura extraction
    and before the Gopher/dedup stages). Per ``\\n``-line, remove:

      * ``mainly_uppercase`` — more than half of the line's LETTERS are
        uppercase (and the line has at least one letter)
      * ``numeric_only`` — only digits / spaces / ``.,:%/-`` punctuation,
        with at least one digit (timestamps, vote tallies, page numbers)
      * ``social_counter`` — ``<number> <likes|comments|shares|views|
        retweets|followers>`` (case-insensitive, trimmed)
      * ``nav_word`` — a single navigation boilerplate word (trimmed,
        case-insensitive: home/menu/login/…)

    then drop the whole document when the corrections removed more than
    ``max_removed_pct`` % of its characters (the paper's G.2 document
    rule) — the threshold test is the integer cross-multiplication
    ``removed*100 > pct*total`` so no float boundary can flip a doc.

    Returns one row per input doc: all non-text columns, ``text`` =
    the rebuilt page, n_lines_kept, n_lines_removed, removed_char_frac
    (round 6, display only), keep, reason (``excess_removal`` or NULL).

    Pure codegen (split / filter-lambda / regexp length-difference
    counting) — a zero-shuffle map over the scan like the C4 and Gopher
    packs; character classes are shared Java-regex/RE2 syntax so the
    DuckDB oracle evaluates the identical automata.
    """
    upper_frac = lambda l: (
        (F.length(l) - F.length(F.regexp_replace(l, "[A-Z]", ""))) * 2
        > (F.length(l) - F.length(F.regexp_replace(l, "[A-Za-z]", "")))
    ) & l.rlike("[A-Za-z]")
    numeric_only = lambda l: l.rlike("^[-0-9 .,:%/]+$") & l.rlike("[0-9]")
    counter_re = "^[0-9]+ (" + "|".join(counter_words) + ")$"
    counter = lambda l: F.lower(F.trim(l)).rlike(counter_re)
    nav_set = tuple(w.lower() for w in nav_words)
    nav = lambda l: F.lower(F.trim(l)).isin(*nav_set)

    lines = F.split(F.col(text_col), "\n")
    kept_lines = F.filter(
        lines,
        lambda l: ~(upper_frac(l) | numeric_only(l) | counter(l) | nav(l)),
    )
    d = docs.select(
        "*",
        F.length(text_col).cast("long").alias("_tc"),
        F.size(lines).cast("long").alias("_nl"),
        kept_lines.alias("_kl"),
    ).select("*", F.concat_ws("\n", "_kl").alias("_kept"))
    removed = F.col("_tc") - F.length("_kept")
    reason = F.when(
        removed * 100 > F.lit(int(max_removed_pct)) * F.col("_tc"),
        F.lit("excess_removal"),
    )
    out_cols = [c for c in docs.columns if c != text_col]
    return d.select(
        *out_cols,
        F.col("_kept").alias(text_col),
        F.size("_kl").cast("long").alias("n_lines_kept"),
        (F.col("_nl") - F.size("_kl")).cast("long").alias("n_lines_removed"),
        F.round(
            removed / F.greatest(F.col("_tc"), F.lit(1)), 6
        ).alias("removed_char_frac"),
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def ccnet_normalize(
    docs: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """CCNet text normalization (Wenzek et al. 2020 — the canonical
    pre-LM-scoring cleanup applied before KenLM perplexity): lowercase,
    every digit mapped to ``0``, control/non-printing characters
    removed, whitespace runs collapsed to single spaces, ends trimmed.
    (The paper's Unicode accent folding needs ICU tables; this engine's
    corpus contract is ASCII text, so the accent step is a no-op by
    construction and intentionally omitted rather than approximated.)

    Returns all input columns with ``text`` replaced by the normalized
    form plus ``n_chars_raw`` / ``n_chars_norm``. Pure codegen
    (lower/regexp_replace/trim) — a zero-shuffle map over the scan; the
    regex character classes are shared Java-regex/RE2 syntax so a DuckDB
    oracle evaluates identical automata."""
    t = F.col(text_col)
    norm = F.lower(t)
    norm = F.regexp_replace(norm, "[0-9]", "0")
    # whitespace-class controls become spaces (they separate words);
    # the remaining controls are noise and vanish
    norm = F.regexp_replace(norm, "[\\t\\n\\r\\x0b\\x0c]", " ")
    norm = F.regexp_replace(norm, "[\\x00-\\x1f\\x7f]", "")
    norm = F.trim(F.regexp_replace(norm, " +", " "))
    out_cols = [c for c in docs.columns if c != text_col]
    return docs.select(
        *out_cols,
        F.length(t).cast("long").alias("n_chars_raw"),
        norm.alias(text_col),
    ).select(
        *out_cols,
        text_col,
        "n_chars_raw",
        F.length(text_col).cast("long").alias("n_chars_norm"),
    )


def sample_by_hash(
    docs: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Deterministic Bernoulli sampling: keep a row iff the first 8 hex
    chars of ``md5(salt || ':' || id)`` parse below ``rate · 2^32``. The
    standard reproducible-subset primitive for corpus work — the kept
    set is a pure function of (id, salt), so it is stable under corpus
    growth, identical across engines (the relational-sketch md5 parity
    trick), and independent samples come from different salts. Unlike
    ``df.sample`` there is no RNG state: re-running, resuming, or
    re-partitioning cannot change the sample.

    Zero-shuffle codegen filter pushed at the scan."""
    if not (0.0 <= rate <= 1.0):
        raise ValueError("rate must be in [0, 1]")
    threshold = int(rate * (1 << 32))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))),
            1, 8,
        ),
        16, 10,
    ).cast("long")
    return docs.filter(h < F.lit(threshold))


def ngram_novelty_per_source(
    docs: DataFrame,
    max_n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """N-gram novelty curves (the RAVEN analysis — McCoy et al. 2021,
    "How much do language models copy?"): for every gram size
    ``n = 1..max_n``, the fraction of a source's n-gram OCCURRENCES that
    are corpus-first (novel) vs repeats of something already seen.
    Occurrence order is the deterministic corpus order (doc_id, char
    start); a gram's single novel occurrence is attributed to the
    source of the document where it first appears. Low novelty at small
    n is normal (vocabulary reuse); low novelty at large n means the
    source is copying long spans — the memorization forensics signal.

    Returns (source, n, n_occurrences, n_novel, novel_frac) with
    ``novel_frac`` rounded to 1e-6 for display.

    Scale shape: gram TEXT never shuffles — one window pass (max_n − 1
    leads over per-word md5 digests) builds every gram size, gram id =
    md5 of joined word digests (the gopher_repetition convention, so a
    DuckDB oracle rebuilds identical ids). The corpus-wide first-
    occurrence reduction is the honest cost: one (n, gram-digest)-keyed
    aggregate carrying only digests + two ints, followed by two tiny
    per-(source, n) aggregates."""
    if max_n < 1:
        raise ValueError("max_n must be >= 1")
    from bloomine_spark.functions.grams import word_gram_digests

    # the window builder, deliberately: a shuffle-free zip_with-ladder
    # digest builder (array-side joins of per-word digests, no
    # Exchange+Sort) was implemented, measured, and REJECTED — nested
    # higher-order chains leave whole-stage codegen and the per-n
    # entries re-derive the ladder (no common-subexpression sharing
    # across array expressions): 10.3 → 173 s at 10× sf0.1 multi-n, and
    # 3.1 → 37 s even for a single n=13. The one corpus Exchange+Sort
    # is far cheaper than interpreted ladder evaluation.
    g = word_gram_digests(
        docs.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
        ),
        range(1, max_n + 1), "_t", carry_cols=("source",),
    )
    # a gram's unique first occurrence: min (doc_id, start) — source
    # rides along because (doc_id, start) identifies one occurrence.
    # Grouping key = unhex(gh): the 16-byte binary is bijective with the
    # 32-char hex digest, and the corpus-wide aggregate's cost tracks
    # key bytes (same lesson as the candidate-pair aggregate).
    firsts = g.groupBy("n", F.unhex("gh").alias("gb")).agg(
        F.min(F.struct("doc_id", "start", "source")).alias("f")
    )
    novel = firsts.groupBy(F.col("f.source").alias("source"), "n").agg(
        F.count("*").cast("long").alias("n_novel")
    )
    # occurrence totals are CLOSED-FORM in the per-doc split width (a
    # size-n window exists at position p iff p + n <= width, so a doc
    # contributes max(width − n + 1, 0) occurrences — word_gram_digests
    # guards exactly this via its lead-nullity filter): one narrow scan
    # replaces the second corpus-scale window+md5 pass the old
    # g.groupBy(source, n) count re-derived. The >0 filter mirrors the
    # old shape, where a (source, n) with no occurrences produced no
    # totals row at all (never a 0/0 division downstream).
    wc = docs.select(
        F.col(source_col).alias("source"),
        F.size(F.split(F.col(text_col), " ")).alias("_c"),
    )
    totals = (
        wc.select(
            "source",
            F.explode(F.expr(f"sequence(1, {int(max_n)})")).alias("n"),
            "_c",
        )
        .groupBy("source", "n")
        .agg(
            F.sum(
                F.greatest(F.col("_c") - F.col("n") + 1, F.lit(0))
            ).cast("long").alias("n_occurrences")
        )
        .filter(F.col("n_occurrences") > 0)
    )
    return (
        totals.join(novel, ["source", "n"], "left")
        .select(
            "source",
            F.col("n").cast("long").alias("n"),
            "n_occurrences",
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long"))
            .alias("n_novel"),
            F.round(
                F.coalesce(F.col("n_novel"), F.lit(0).cast("long"))
                / F.col("n_occurrences"), 6,
            ).alias("novel_frac"),
        )
    )


def vocab_coverage(
    docs: DataFrame,
    ks: tuple[int, ...] = (100, 1000, 10000),
    text_col: str = "text",
) -> DataFrame:
    """Vocabulary coverage curve — for each cutoff k, the fraction of
    all token OCCURRENCES covered by the k most frequent token types
    (the tokenizer-design primitive: how big a vocab buys how much of
    the stream). Returns (k, vocab_size, covered, total, coverage) with
    vocab_size = min(k, |vocab|).

    Deterministic and oracle-exact: ranking ties break by token string,
    the running coverage is an ORDERED cumulative sum of integer counts,
    and the only double is one final division of identical integers.

    Plan shape at scale: the corpus-sized work is a single (token)
    count aggregate with map-side partials. The global sort is NOT
    materialized — web-scale vocab is billions of token types (typos,
    urls), so the single-partition ranking window only ever sees the
    top max(k) rows, selected by a distributed TakeOrderedAndProject
    (per-partition partial top-k, merged on the driver), and the
    occurrence total is a separate scalar aggregate broadcast in."""
    tok = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("t")
    ).filter(F.col("t") != "")
    freq = tok.groupBy("t").agg(F.count("*").cast("long").alias("c"))
    total = freq.agg(F.sum("c").cast("long").alias("total"))
    order = [F.desc("c"), F.asc("t")]
    # orderBy(...).limit(n) compiles to TakeOrderedAndProject: each
    # partition keeps its own top-n, only n rows per partition move.
    topk = freq.orderBy(*order).limit(max(ks))
    w_rank = Window.orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = topk.select(
        "c",
        "t",
        F.row_number().over(w_rank).alias("r"),
        F.sum("c").over(w_cum).alias("cum"),
    ).crossJoin(F.broadcast(total))
    fan = ranked.filter(F.col("r") <= max(ks)).withColumn(
        "k", F.explode(F.array(*[F.lit(int(k)) for k in ks]))
    ).filter(F.col("r") <= F.col("k"))
    return fan.groupBy(F.col("k").cast("long").alias("k")).agg(
        F.max("r").cast("long").alias("vocab_size"),
        F.max("cum").cast("long").alias("covered"),
        F.max("total").cast("long").alias("total"),
        (
            F.max("cum").cast("double") / F.max("total").cast("double")
        ).alias("coverage"),
    )


def zipf_fit_per_source(
    docs: DataFrame,
    top_r: int = 1000,
    min_count: int = 2,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Zipf power-law fit per source: OLS slope/intercept of
    ``ln(freq)`` against ``ln(rank)`` over the top-``top_r`` token types
    (rank by freq desc, token asc — fully deterministic). A natural-text
    source fits slope ≈ −1 (Zipf 1949); templated/boilerplate sources
    flatten toward 0, noise steepens — a corpus-forensics signal a
    curation run logs per source.

    Fitting the HEAD is both the statistics (the tail of a finite corpus
    departs from the power law) and the scale posture: ``min_count``
    prunes the huge hapax tail BEFORE the per-source ranking window, so
    the window input is the surviving head, not web-scale vocab; at
    100 TB the prune threshold rises with corpus size and the window
    stays bounded. Closed-form OLS — two narrowing aggregates, no
    iteration; doubles association noise ~1e-12 under the 1e-6 canon.

    Returns (source, n_types_fit, slope, intercept)."""
    tok = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    freq = (
        tok.groupBy("source", "t")
        .agg(F.count("*").cast("long").alias("c"))
        .filter(F.col("c") >= min_count)
    )
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("t"))
    ranked = (
        freq.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top_r)
        .select(
            "source",
            F.log(F.col("r").cast("double")).alias("x"),
            F.log(F.col("c").cast("double")).alias("y"),
        )
    )
    agg = ranked.groupBy("source").agg(
        F.count("*").cast("long").alias("n_types_fit"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_types_fit").cast("double")
    # <2 fit points (or a degenerate all-equal-x head) has no line:
    # slope/intercept NULL rather than an ANSI divide-by-zero
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.when(
        denom != 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    return agg.select(
        "source",
        "n_types_fit",
        slope.alias("slope"),
        F.when(denom != 0, (F.col("sy") - slope * F.col("sx")) / n)
        .alias("intercept"),
    )


def heaps_fit_per_source(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Heaps' law vocabulary-growth fit per source: ``V(n) = K·n^β``
    (Heaps 1978; β ≈ 0.5 for natural text) — the companion diagnostic to
    the Zipf fit. A source whose vocabulary growth flattens (low β) is
    template/boilerplate-heavy; synthetic or noisy text pushes β toward
    1. Curation runs log (β, ln K) per source next to the Zipf slope.

    Growth curve construction is fully relational and deterministic:
    docs are ordered by ``doc_id`` within each source, cumulative token
    count ``n_i`` is a window sum of per-doc counts, and cumulative
    vocabulary ``V_i`` is a window sum of the types whose FIRST
    occurrence (min doc_id over the (source, type) relation) is doc i.
    OLS of ``ln V`` on ``ln n`` over the per-doc points (zero-token
    prefix rows excluded — no ln 0), same closed form and NULL-on-
    degenerate-denominator guard as ``zipf_fit_per_source``.

    Scale shape: one corpus scan; the vocab-scale relation reduces to
    (source, type) → min(doc_id) then immediately to per-doc new-type
    counts, so the window input is |docs|, never |vocab|; two narrow
    shuffles + one per-source window.

    Returns (source, n_docs_fit, beta, ln_k)."""
    tok = (
        docs.select(
            F.col(source_col).alias("source"),
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    per_doc = tok.groupBy("source", "doc_id").agg(
        F.count("*").cast("long").alias("n_tok")
    )
    first = tok.groupBy("source", "t").agg(
        F.min("doc_id").alias("doc_id")
    )
    new_types = first.groupBy("source", "doc_id").agg(
        F.count("*").cast("long").alias("n_new")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = (
        per_doc.join(new_types, ["source", "doc_id"], "left")
        .select(
            "source",
            "doc_id",
            F.col("n_tok"),
            F.coalesce(F.col("n_new"), F.lit(0).cast("long")).alias("n_new"),
        )
        .select(
            "source",
            F.sum("n_tok").over(w).alias("cn"),
            F.sum("n_new").over(w).alias("cv"),
        )
        .filter((F.col("cn") > 0) & (F.col("cv") > 0))
        .select(
            "source",
            F.log(F.col("cn").cast("double")).alias("x"),
            F.log(F.col("cv").cast("double")).alias("y"),
        )
    )
    agg = pts.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs_fit"),
        F.sum("x").alias("sx"), F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n_docs_fit").cast("double")
    denom = n * F.col("sxx") - F.col("sx") * F.col("sx")
    beta = F.when(
        denom != 0,
        (n * F.col("sxy") - F.col("sx") * F.col("sy")) / denom,
    )
    return agg.select(
        "source",
        "n_docs_fit",
        beta.alias("beta"),
        F.when(denom != 0, (F.col("sy") - beta * F.col("sx")) / n)
        .alias("ln_k"),
    )


def source_jsd_pairs(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise Jensen–Shannon divergence between the unigram
    distributions of every source pair — the corpus-mixture diagnostic
    (which sources are near-identical crawls, which are genuinely
    distinct domains). Natural-log JSD ∈ [0, ln 2].

    Relational decomposition: the token self-join only materializes
    SHARED types (each token contributes #sources² pair rows, bounded);
    the disjoint-support remainder needs no join at all —
    ``Σ_{t∉shared} 0.5·p·ln2`` telescopes to
    ``0.5·ln2·(2 − Σ_shared p_a − Σ_shared p_b)``, so per pair we carry
    two extra running sums instead of an outer join. Probabilities are
    per-source scalars (count / broadcast total); doubles association
    noise ~1e-12 under the 1e-6 canon.

    Returns (source_a, source_b, n_shared_types, jsd), a < b."""
    tok = (
        docs.select(
            F.col(source_col).alias("source"),
            F.explode(F.split(F.col(text_col), " ")).alias("t"),
        )
        .filter(F.col("t") != "")
    )
    freq = tok.groupBy("source", "t").agg(
        F.count("*").cast("long").alias("c")
    )
    totals = freq.groupBy("source").agg(
        F.sum("c").cast("long").alias("tot")
    )
    probs = freq.join(F.broadcast(totals), "source").select(
        "source", "t", (F.col("c") / F.col("tot")).alias("p")
    )
    a = probs.select(
        F.col("source").alias("source_a"), "t", F.col("p").alias("pa")
    )
    b = probs.select(
        F.col("source").alias("source_b"), "t", F.col("p").alias("pb")
    )
    joined = a.join(b, "t").filter(F.col("source_a") < F.col("source_b"))
    ln2 = math.log(2.0)
    contrib = (
        F.lit(0.5) * F.col("pa")
        * F.log(F.lit(2.0) * F.col("pa") / (F.col("pa") + F.col("pb")))
        + F.lit(0.5) * F.col("pb")
        * F.log(F.lit(2.0) * F.col("pb") / (F.col("pa") + F.col("pb")))
    )
    return (
        joined.groupBy("source_a", "source_b")
        .agg(
            F.count("*").cast("long").alias("n_shared_types"),
            F.sum(contrib).alias("_shared"),
            F.sum("pa").alias("_ma"),
            F.sum("pb").alias("_mb"),
        )
        .select(
            "source_a",
            "source_b",
            "n_shared_types",
            (
                F.col("_shared")
                + F.lit(0.5 * ln2) * (F.lit(2.0) - F.col("_ma") - F.col("_mb"))
            ).alias("jsd"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher repetition rule pack (Rae et al. 2021, Table A1)
# ---------------------------------------------------------------------------

# (rule, threshold-in-hundredths) in the paper's table order; `keep` is
# the conjunction and `reason` the FIRST failing rule in this order
GOPHER_REPETITION_THRESHOLDS: tuple[tuple[str, int], ...] = (
    ("dup_line_frac", 30),
    ("dup_para_frac", 30),
    ("dup_line_char_frac", 20),
    ("dup_para_char_frac", 20),
    ("top2_char_frac", 20),
    ("top3_char_frac", 18),
    ("top4_char_frac", 16),
    ("dup5_char_frac", 15),
    ("dup6_char_frac", 14),
    ("dup7_char_frac", 13),
    ("dup8_char_frac", 12),
    ("dup9_char_frac", 11),
    ("dup10_char_frac", 10),
)


def gopher_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    thresholds: dict[str, int] | None = None,
) -> DataFrame:
    """Gopher repetition rule pack (Rae et al. 2021 Table A1 — the
    standard intra-document repetition gate, the other half of
    ``gopher_quality``): per document,

      dup_line_frac / dup_para_frac      fraction of non-empty lines /
                                         blank-line-separated paragraphs
                                         that are repeats (occurrences
                                         beyond the first)
      dup_line_char_frac / dup_para_..   characters in those repeats
                                         over total characters
      topN_char_frac   (N = 2,3,4)       characters covered by ALL
                                         occurrences of the single most
                                         frequent word N-gram (count
                                         ties -> longer gram), counted
                                         only when that gram occurs
                                         >= 2 times — a unique gram is
                                         not repetition
      dupN_char_frac   (N = 5..10)       characters inside at least one
                                         word N-gram whose content
                                         occurs >= 2 times in the doc —
                                         ALL occurrences, overlaps
                                         merged positionally
                                         (gaps-and-islands) so every
                                         character counts once

    plus ``keep`` (all 13 rules pass) and ``reason`` (first failing rule
    in table order, NULL if kept). Thresholds are the paper's, passed in
    HUNDREDTHS so every rule is an integer cross-multiplication
    (covered*100 <= thr*total) — no float boundary can flip a rule
    across engines; reported fractions are round(x, 6) for display.

    Words are the raw single-space split (runs of spaces yield empty
    words), so an N-gram IS the exact substring of the document and its
    char span is [start, start+len) — positional coverage is exact.

    Scale shape: neither line nor gram TEXT ever shuffles. Lines and
    paragraphs reduce to (md5, length) before their per-doc counts; the
    word relation shuffles once keyed by doc_id carrying only per-word
    digests + lengths, and ONE window pass (9 leads) builds all nine
    gram sizes; gram identity is md5-of-word-digests. The island merge
    is a per-(doc, n) window over duplicated spans only. Everything is
    built-in expressions — no Python in the path.
    """
    thr = dict(GOPHER_REPETITION_THRESHOLDS)
    if thresholds:
        unknown = set(thresholds) - set(thr)
        if unknown:
            raise ValueError(
                f"unknown repetition rule(s): {sorted(unknown)}; "
                f"valid: {sorted(thr)}"
            )
        thr.update(thresholds)
    max_n = 10

    d0 = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    )
    base = d0.select(
        "doc_id", "_t", F.length("_t").cast("long").alias("n_chars")
    )

    def _unit_dups(sep: str, prefix: str) -> DataFrame:
        # repeats among non-empty units: count per (doc, md5(unit));
        # identical digest => identical text => identical length
        units = base.select(
            "doc_id",
            F.explode(
                F.filter(F.split("_t", sep), lambda x: x != F.lit(""))
            ).alias("_u"),
        ).select(
            "doc_id",
            F.md5("_u").alias("h"),
            F.length("_u").cast("long").alias("l"),
        )
        per = units.groupBy("doc_id", "h").agg(
            F.count("*").cast("long").alias("c"), F.max("l").alias("l")
        )
        return per.groupBy("doc_id").agg(
            F.sum("c").cast("long").alias(f"n_{prefix}"),
            F.sum(F.col("c") - 1).cast("long").alias(f"dup_{prefix}"),
            F.sum((F.col("c") - 1) * F.col("l")).cast("long").alias(
                f"dup_{prefix}_chars"
            ),
        )

    lines = _unit_dups("\n", "lines")
    paras = _unit_dups("\n\n", "paras")

    # word relation: digests + lengths only — functions/grams.py owns
    # the shared digest convention (one window pass builds all sizes)
    from bloomine_spark.functions.grams import word_gram_digests

    g = word_gram_digests(
        d0.select("doc_id", "_t"), range(2, max_n + 1), "_t",
        with_length=True,
    )
    counts = g.groupBy("doc_id", "n", "gh").agg(
        F.count("*").cast("long").alias("c"), F.max("gl").alias("gl")
    )

    # top N-gram (N=2,3,4): struct max = highest count, ties longer gram;
    # a gram occurring once is not repetition — only c >= 2 charges chars
    # (otherwise every doc shorter than ~2/threshold words fails on its
    # own first trigram)
    top = (
        counts.filter((F.col("n") <= 4) & (F.col("c") >= 2))
        .groupBy("doc_id", "n")
        .agg(F.max(F.struct(F.col("c"), F.col("gl"))).alias("m"))
        .groupBy("doc_id")
        .agg(
            *[
                F.max(
                    F.when(
                        F.col("n") == n,
                        F.col("m.c") * F.col("m.gl"),
                    )
                ).cast("long").alias(f"top{n}_chars")
                for n in (2, 3, 4)
            ]
        )
    )

    # duplicated N-grams (N=5..10): all occurrences of any gram with
    # c >= 2, char spans merged per (doc, n) before counting
    occ = g.join(
        counts.filter((F.col("c") >= 2) & (F.col("n") >= 5))
        .select("doc_id", "n", "gh"),
        ["doc_id", "n", "gh"],
    ).select("doc_id", "n", "start", "gl")
    wisl = Window.partitionBy("doc_id", "n").orderBy("start", "gl")
    prev_end = F.max(F.col("start") + F.col("gl")).over(
        wisl.rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = (
        occ.withColumn(
            "_ni",
            (F.col("start") > F.coalesce(prev_end, F.lit(-1))).cast("long"),
        )
        .withColumn("_isl", F.sum("_ni").over(wisl))
        .groupBy("doc_id", "n", "_isl")
        .agg(
            (
                F.max(F.col("start") + F.col("gl")) - F.min("start")
            ).alias("_cov")
        )
        .groupBy("doc_id", "n")
        .agg(F.sum("_cov").cast("long").alias("_dup"))
        .groupBy("doc_id")
        .agg(
            *[
                F.max(F.when(F.col("n") == n, F.col("_dup")))
                .cast("long").alias(f"dup{n}_chars")
                for n in range(5, max_n + 1)
            ]
        )
    )

    j = (
        base.drop("_t")
        .join(lines, "doc_id", "left")
        .join(paras, "doc_id", "left")
        .join(top, "doc_id", "left")
        .join(cov, "doc_id", "left")
    )
    z = F.lit(0).cast("long")
    num = {
        "dup_line_frac": F.coalesce(F.col("dup_lines"), z),
        "dup_para_frac": F.coalesce(F.col("dup_paras"), z),
        "dup_line_char_frac": F.coalesce(F.col("dup_lines_chars"), z),
        "dup_para_char_frac": F.coalesce(F.col("dup_paras_chars"), z),
        "top2_char_frac": F.coalesce(F.col("top2_chars"), z),
        "top3_char_frac": F.coalesce(F.col("top3_chars"), z),
        "top4_char_frac": F.coalesce(F.col("top4_chars"), z),
        **{
            f"dup{n}_char_frac": F.coalesce(F.col(f"dup{n}_chars"), z)
            for n in range(5, max_n + 1)
        },
    }
    den = {
        "dup_line_frac": F.coalesce(F.col("n_lines"), z),
        "dup_para_frac": F.coalesce(F.col("n_paras"), z),
    }
    for name in num:
        if name not in den:
            den[name] = F.col("n_chars")

    frac_cols = [
        F.round(
            num[name] / F.greatest(den[name], F.lit(1)), 6
        ).alias(name)
        for name, _ in GOPHER_REPETITION_THRESHOLDS
    ]
    fails = [
        (name, num[name] * 100 > F.lit(thr[name]) * den[name])
        for name, _ in GOPHER_REPETITION_THRESHOLDS
    ]
    reason = F.lit(None).cast("string")
    for name, cond in reversed(fails):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return j.select(
        "doc_id",
        "n_chars",
        F.coalesce(F.col("n_lines"), z).alias("n_lines"),
        F.coalesce(F.col("n_paras"), z).alias("n_paras"),
        *frac_cols,
        reason.isNull().alias("keep"),
        reason.alias("reason"),
    )


def readability_per_source(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease / Flesch–Kincaid grade per source (Kincaid
    1975) — the classic readability pair, over a deterministic syllable
    heuristic: syllables(word) = max(1, vowel groups ``[aeiouy]+``).

    Engine-portable by construction: words, sentences, and syllables are
    exact INTEGER corpus sums per source (sentence count = max(1 per
    doc, terminator runs ``[.!?]+``); the zero-vowel correction counts
    words with no vowel at all), and each score is one pinned sequence
    of correctly-rounded double ops on those integers — no float ever
    aggregates. Plan: zero-Python codegen map + one partial-agg shuffle.
    """
    t = F.col(text_col)
    n_words = F.size(F.split(t, " ")).cast("long")
    n_sent = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)"))
        .cast("long"),
    )
    vowel_groups = F.size(
        F.expr(f"regexp_extract_all({text_col}, '[aeiouy]+', 0)")
    ).cast("long")
    no_vowel_words = F.size(
        F.filter(
            F.split(t, " "), lambda w: ~w.rlike("[aeiouy]")
        )
    ).cast("long")
    per_doc = docs.select(
        "source",
        n_words.alias("w"),
        n_sent.alias("s"),
        (vowel_groups + no_vowel_words).alias("sy"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("w").alias("n_words"),
        F.sum("s").alias("n_sentences"),
        F.sum("sy").alias("n_syllables"),
    )
    wps = F.col("n_words").cast("double") / F.col("n_sentences")
    spw = F.col("n_syllables").cast("double") / F.col("n_words")
    return agg.select(
        "source",
        "n_words",
        "n_sentences",
        "n_syllables",
        (F.lit(206.835) - F.lit(1.015) * wps - F.lit(84.6) * spw)
        .alias("flesch_reading_ease"),
        (F.lit(0.39) * wps + F.lit(11.8) * spw - F.lit(15.59))
        .alias("fk_grade"),
    )


# Unicode script ranges (BMP core blocks) — the literal characters
# embed in the patterns so the same class strings run on Java regex
# AND DuckDB's RE2, and the oracles interpolate THESE constants
SCRIPT_RANGES = {
    "latin": "A-Za-zÀ-ɏ",
    "cyrillic": "Ѐ-ӿ",
    "greek": "Ͱ-Ͽ",
    "arabic": "؀-ۿ",
    "hebrew": "֐-׿",
    "devanagari": "ऀ-ॿ",
    "cjk": "一-鿿",
    "kana": "぀-ヿ",
    "hangul": "가-힯",
}


def script_mix(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Unicode-script composition per doc — the multilingual triage
    BEFORE any language model runs (script is certain where language is
    statistical: Cyrillic text is never English, and a 50/50
    Latin-CJK doc is a mixed page that should route to segmentation,
    not to one lang-id label): per-script character counts over the
    core BMP blocks, ``n_script`` (their sum), ``dominant_script``
    (argmax, name ascending on ties, ``none`` when no script chars),
    and ``dominant_frac`` (dominant / n_script).

    Counting is ``length(text) − length(regexp_replace(text, [class],
    ''))`` per script — pure whole-stage codegen, zero exchange, and
    the class strings are module constants the oracle interpolates.
    """
    t = F.col(text_col)
    counts = {
        name: (
            F.length(t)
            - F.length(F.regexp_replace(t, f"[{rng}]", ""))
        ).cast("long")
        for name, rng in SCRIPT_RANGES.items()
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    # argmax by (count DESC, name ASC): fold over a sorted struct array
    pairs = F.array(
        *[
            F.struct(counts[n].alias("c"), F.lit(n).alias("s"))
            for n in sorted(SCRIPT_RANGES)
        ]
    )
    best = F.array_sort(
        pairs,
        lambda a, b: F.when(a["c"] > b["c"], -1)
        .when(a["c"] < b["c"], 1)
        .otherwise(F.when(a["s"] < b["s"], -1).when(a["s"] > b["s"], 1)
                   .otherwise(0)),
    )[0]
    return docs.select(
        F.col(id_col),
        *[counts[n].alias(f"n_{n}") for n in sorted(SCRIPT_RANGES)],
        total.alias("n_script"),
        F.when(total > 0, best["s"]).otherwise(F.lit("none"))
        .alias("dominant_script"),
        F.when(total > 0, F.round(best["c"] / total, 6))
        .alias("dominant_frac"),
    )
