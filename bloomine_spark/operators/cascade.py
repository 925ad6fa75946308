"""Two-flank cascade, combined flank-score merge, MOI variant counting,
and polyfamily probe binning — the reference's orchestration layer
(/root/reference/bloomine/BloomineRunner.py, moi.py, polyfamily.py)
re-expressed as relational Spark plans.

The cascade itself is cardinality-aware staging: flank 2 screens only
flank-1 survivors (/root/reference/bloomine/BloomineRunner.py:76-94) — in
Spark that's simply chaining the second screen onto the first's hit set, so
AQE sees the shrunken input and re-plans downstream partitioning.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bloomine_spark.operators.screen import screen_scores
from bloomine_spark.params import ScreenParams


def _flank_best(scores: DataFrame, flank: int) -> DataFrame:
    """Per-doc best forward/RC score for one flank — the per-(read,rc,flank)
    max of /root/reference/bloomine/BloomineRunner.py:230-233 pivoted to
    columns."""
    return scores.groupBy("doc_id").agg(
        F.max(F.when(~F.col("rc"), F.col("score"))).alias(f"f{flank}_score"),
        F.max(F.when(F.col("rc"), F.col("score"))).alias(f"f{flank}_rc_score"),
    )


def combined_flank_scores(
    scores1: DataFrame, scores2: DataFrame, thr1: float, thr2: float
) -> DataFrame:
    """Full-outer merge of the two flank score logs (J1,
    /root/reference/bloomine/BloomineRunner.py:236-274).

    pass = 1 iff best(f1) ≥ thr1 AND best(f2) ≥ thr2, null-safe (a missing
    flank fails); threshold column = max(thr1, thr2) as the reference writes.
    """
    f1 = _flank_best(scores1, 1)
    f2 = _flank_best(scores2, 2)
    j = f1.join(f2, "doc_id", "full_outer")
    f1_best = F.greatest(F.col("f1_score"), F.col("f1_rc_score"))
    f2_best = F.greatest(F.col("f2_score"), F.col("f2_rc_score"))
    return j.select(
        "doc_id",
        "f1_score",
        "f1_rc_score",
        "f2_score",
        "f2_rc_score",
        F.lit(float(max(thr1, thr2))).alias("threshold"),
        F.when(
            f1_best.isNotNull()
            & f2_best.isNotNull()
            & (f1_best >= F.lit(float(thr1)))
            & (f2_best >= F.lit(float(thr2))),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("pass"),
    )


def cascade(
    df: DataFrame,
    flank1: Sequence[int],
    flank2: Sequence[int],
    params: ScreenParams = ScreenParams(),
    keep_tokens: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-flank screen: flank-2 runs on flank-1 survivors only (J3 cascade
    semi-join). Returns (hits, scores1, scores2); ``hits`` passed BOTH
    flanks and carries tokens for MOI when keep_tokens."""
    s1 = screen_scores(df, flank1, params, keep_tokens=True).cache()
    survivors1 = s1.filter(F.col("sp_pass"))
    # flank-2 input: reconstruct a sequences-shaped frame from survivors
    seq_cols = [c for c in df.columns]
    f2_input = survivors1.select(*seq_cols)
    s2 = screen_scores(f2_input, flank2, params, keep_tokens=keep_tokens).cache()
    hits = s2.filter(F.col("sp_pass"))
    return hits, s1, s2


# ---------------------------------------------------------------------------
# MOI: isolate the inter-flank region and count variants
# ---------------------------------------------------------------------------

def _kascade_hashes(flank: np.ndarray, min_kmer: int):
    """[(k, flank_kgram_hashes, flank_kgram_matrix)] for k from len(flank)
    down to min_kmer — make_kascade (/root/reference/bloomine/moi.py:181-206)."""
    from bloomine_spark.functions.hashing import rolling_kgram_hash

    out = []
    for k in range(len(flank), min_kmer - 1, -1):
        n = len(flank) - k + 1
        h = rolling_kgram_hash(flank.astype(np.uint64), n, k)
        mat = np.lib.stride_tricks.sliding_window_view(flank, k)
        out.append((k, h, mat))
    return out


def _kmer_hit(
    kascade, read: np.ndarray, read_rev: np.ndarray, flank_flag: str,
    len_flank: int,
):
    """First (longest-k) anchor hit of the flank in the read, fwd preferred
    per kmer — kmer_hit (/root/reference/bloomine/moi.py:80-128). Returns
    (pos, orientation) or (None, None)."""
    from bloomine_spark.functions.hashing import rolling_kgram_hash

    for k, fh, fmat in kascade:
        nw = len(read) - k + 1
        if nw <= 0:
            continue
        rh = rolling_kgram_hash(read.astype(np.uint64), nw, k)
        ch = rolling_kgram_hash(read_rev.astype(np.uint64), nw, k)
        for i in range(len(fh)):
            fwd_idx = np.flatnonzero(rh == fh[i])
            hit_idx = None
            orientation = None
            for cand in fwd_idx:
                if (read[cand : cand + k] == fmat[i]).all():
                    hit_idx, orientation = int(cand), "+"
                    break
            if hit_idx is None:
                rev_idx = np.flatnonzero(ch == fh[i])
                for cand in rev_idx:
                    if (read_rev[cand : cand + k] == fmat[i]).all():
                        hit_idx, orientation = int(cand), "-"
                        break
            if hit_idx is None:
                continue
            if flank_flag == "head":
                return hit_idx + len_flank - i - 1, orientation
            return hit_idx - i, orientation
    return None, None


def extract_targets(
    hits: DataFrame,
    head_flank: Sequence[int],
    tail_flank: Sequence[int],
    min_kmer: int = 11,
    tokens_col: str = "tokens",
) -> DataFrame:
    """Isolate the inter-flank region per hit read — isolate_target
    (/root/reference/bloomine/moi.py:17-77), token domain (RC = reversal).

    Output: doc_id, extracted (array<int>). Runs as mapInPandas over the
    (small, post-cascade) hit set.
    """
    head = np.asarray(list(head_flank), dtype=np.int64)
    tail = np.asarray(list(tail_flank), dtype=np.int64)
    kas_head = _kascade_hashes(head, min_kmer)
    kas_tail = _kascade_hashes(tail, min_kmer)
    len_head, len_tail = len(head), len(tail)

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("extracted", T.ArrayType(T.IntegerType())),
            T.StructField("head_pos", T.IntegerType()),
            T.StructField("tail_pos", T.IntegerType()),
            T.StructField("orientation", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k.name: [] for k in schema.fields}
            for doc_id, toks in zip(pdf["doc_id"], pdf[tokens_col]):
                read = np.asarray(toks, dtype=np.int64)
                read_rev = read[::-1].copy()
                head_pos, o_h = _kmer_hit(kas_head, read, read_rev, "head", len_head)
                tail_pos, o_t = _kmer_hit(kas_tail, read, read_rev, "tail", len_tail)
                if head_pos is None or tail_pos is None or o_h != o_t:
                    continue
                raw_head, raw_tail = head_pos, tail_pos
                n = len(read)
                if head_pos > tail_pos:
                    head_pos = n - head_pos + len_head + 1
                    tail_pos = n - tail_pos - len_tail
                seq = read if o_h == "+" else read_rev
                if head_pos <= tail_pos:
                    extracted = seq[head_pos + 1 : tail_pos]
                else:
                    extracted = seq[tail_pos + 1 : head_pos][::-1]
                out["doc_id"].append(doc_id)
                out["extracted"].append(extracted.astype(np.int32))
                out["head_pos"].append(raw_head)
                out["tail_pos"].append(raw_tail)
                out["orientation"].append(o_h)
            if out["doc_id"]:
                yield pd.DataFrame(out)

    return hits.mapInPandas(kernel, schema=schema)


def variant_counts(extracted: DataFrame) -> DataFrame:
    """Sequence-variant counts (A6, /root/reference/bloomine/moi.py:143),
    ordered by count desc — groupBy on the array column itself."""
    return (
        extracted.groupBy("extracted")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"))
    )


def length_variant_counts(extracted: DataFrame) -> DataFrame:
    """Length-variant counts (/root/reference/bloomine/moi.py:144)."""
    return (
        extracted.select(F.size("extracted").alias("variant_len"))
        .groupBy("variant_len")
        .agg(F.count("*").alias("count"))
        .orderBy(F.desc("count"))
    )


# ---------------------------------------------------------------------------
# polyfamily: argmax probe per read (W1) + per-probe binning (W2)
# ---------------------------------------------------------------------------

def flank_intersection(scores1: DataFrame, scores2: DataFrame,
                       thr1: float, thr2: float) -> DataFrame:
    """Legacy inner-join flavor (J2): docs present in BOTH flank score sets
    with each best score above its threshold
    (/root/reference/bloomine/polyfamily.py:84-101, intersection at :91).
    Returns (doc_id, f1_best, f2_best, total)."""
    f1 = scores1.groupBy("doc_id").agg(F.max("score").alias("f1_best"))
    f2 = scores2.groupBy("doc_id").agg(F.max("score").alias("f2_best"))
    return (
        f1.join(f2, "doc_id")  # inner join == keyset intersection (U3)
        .filter(
            (F.col("f1_best") >= F.lit(float(thr1)))
            & (F.col("f2_best") >= F.lit(float(thr2)))
        )
        .select(
            "doc_id", "f1_best", "f2_best",
            (F.col("f1_best") + F.col("f2_best")).alias("total"),
        )
    )


def polyfamily_run(
    df: DataFrame,
    targets: dict[str, tuple],
    params: ScreenParams = ScreenParams(),
) -> DataFrame:
    """Multi-probe polyfamily pipeline (/root/reference/bloomine/run.py:64-130):
    cascade each probe's flank pair over the corpus, combine per-probe flank
    bests (J2 semantics), then argmax-bin docs to probes (W1).

    Returns (doc_id, target_id, total_score) of the winning probe per doc.
    """
    per_probe = None
    for tid, (f1, f2) in sorted(targets.items()):
        hits, s1, s2 = cascade(df, f1, f2, params, keep_tokens=False)
        n1 = len(set(map(tuple, _kgram_tuples(f1, params.k))))
        n2 = len(set(map(tuple, _kgram_tuples(f2, params.k))))
        combined = flank_intersection(
            s1.filter(F.col("sp_pass")), s2.filter(F.col("sp_pass")),
            params.mst(n1), params.mst(n2),
        ).select(
            "doc_id",
            F.lit(tid).alias("target_id"),
            F.col("total").cast("long").alias("total_score"),
        )
        per_probe = combined if per_probe is None else per_probe.unionByName(combined)
        s1.unpersist()
        s2.unpersist()
    return choose_best_probes(per_probe)


def _kgram_tuples(tokens, k):
    arr = list(tokens)
    return [tuple(arr[i : i + k]) for i in range(len(arr) - k + 1)]


def choose_best_probes(per_probe_scores: DataFrame) -> DataFrame:
    """Input: (doc_id, target_id, total_score). Keep the max-total probe per
    doc, ties → lexicographically smaller target_id
    (/root/reference/bloomine/polyfamily.py:152-162)."""
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("total_score"), F.asc("target_id")
    )
    return (
        per_probe_scores.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def bin_reads_by_probe(per_probe_scores: DataFrame) -> DataFrame:
    """Per-probe doc counts after argmax assignment
    (/root/reference/bloomine/polyfamily.py:165-176)."""
    return (
        choose_best_probes(per_probe_scores)
        .groupBy("target_id")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("target_id"))
    )


def max_sum_reads(per_probe_scores: DataFrame) -> DataFrame:
    """Per probe, keep docs whose total equals the probe max (A8,
    /root/reference/bloomine/polyfamily.py:145-147)."""
    w = Window.partitionBy("target_id")
    return (
        per_probe_scores.withColumn("max_total", F.max("total_score").over(w))
        .filter(F.col("total_score") == F.col("max_total"))
        .drop("max_total")
    )
