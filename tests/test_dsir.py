"""DSIR importance weighting (Xie 2023): hand-computed weights on a tiny
corpus, semantic direction (target-like docs score higher), exact-vs-
approx selection agreement, zero-feature docs, partition invariance."""

from __future__ import annotations

import hashlib
import math
import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.dsir import (
    dsir_doc_features,
    dsir_log_weights,
    dsir_report_per_source,
    dsir_select,
)


def _bucket(gram: str, n: int) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16) % n


def _ref_weights(rows, target, n_buckets, lam=1.0):
    feats = {}
    for doc_id, _, text in rows:
        w = [x for x in text.split(" ") if x]
        feats[doc_id] = Counter(
            _bucket(f"{w[i]} {w[i+1]}", n_buckets) for i in range(len(w) - 1)
        )
    r = Counter()
    t = Counter()
    for doc_id, c in feats.items():
        r.update(c)
        if doc_id in target:
            t.update(c)
    r_tot, t_tot = sum(r.values()), sum(t.values())
    out = {}
    for doc_id, c in feats.items():
        s = 0.0
        for b, cb in c.items():
            s += cb * (
                (math.log(t[b] + lam) - math.log(t_tot + lam * n_buckets))
                - (math.log(r[b] + lam) - math.log(r_tot + lam * n_buckets))
            )
        out[doc_id] = s
    return out


def _df(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    return df.repartition(parts) if parts > 1 else df


def test_weights_match_python_reference(spark):
    rng = random.Random(3)
    vocab = [f"t{i}" for i in range(10)]
    rows = [
        (f"d{i}", f"s{i % 2}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 15))))
        for i in range(30)
    ]
    target = {d for d, s, _ in rows if s == "s0"}
    ref = _ref_weights(rows, target, n_buckets=32)
    got = {
        r["doc_id"]: r["log_iw"]
        for r in dsir_log_weights(
            _df(spark, rows), F.col("source") == "s0", n_buckets=32
        ).collect()
    }
    assert set(got) == set(ref)
    for d in ref:
        assert got[d] == pytest.approx(ref[d], abs=1e-9)


def test_direction_target_like_scores_higher(spark):
    # Target docs speak "aa bb"; raw background speaks "xx yy". A held-out
    # doc written in target language must outscore one in background
    # language.
    rows = (
        [(f"t{i}", "tgt", "aa bb aa bb aa bb") for i in range(5)]
        + [(f"r{i}", "raw", "xx yy xx yy xx yy") for i in range(5)]
        + [("probe_t", "probe", "aa bb aa bb"),
           ("probe_r", "probe", "xx yy xx yy")]
    )
    got = {
        r["doc_id"]: r["log_iw"]
        for r in dsir_log_weights(
            _df(spark, rows), F.col("source") == "tgt", n_buckets=64
        ).collect()
    }
    assert got["probe_t"] > 0 > got["probe_r"]


def test_zero_feature_docs(spark):
    rows = [("a", "s", "solo"), ("b", "s", ""), ("c", "s", "x y x y")]
    got = {
        r["doc_id"]: r
        for r in dsir_log_weights(
            _df(spark, rows), F.col("doc_id") == "c"
        ).collect()
    }
    assert got["a"]["n_feat"] == 0 and got["a"]["log_iw"] == 0.0
    assert got["b"]["n_feat"] == 0 and got["b"]["log_iw"] == 0.0
    assert got["c"]["n_feat"] == 3


def test_select_exact_quota_and_approx_agreement(spark):
    rng = random.Random(9)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (f"d{i:02d}", f"s{i % 3}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 25))))
        for i in range(80)
    ]
    wts = dsir_log_weights(
        _df(spark, rows), F.col("source") == "s0", n_buckets=64
    ).cache()
    ex = dsir_select(wts, frac=0.25, method="exact").collect()
    assert sum(r["selected"] for r in ex) == 20  # exact floor(80*0.25)
    # approx path selects a superset/subset within quantile-sketch slack;
    # with high accuracy it should match the exact threshold closely.
    ap = {r["doc_id"]: r["selected"]
          for r in dsir_select(wts, frac=0.25, method="approx").collect()}
    n_ap = sum(ap.values())
    assert abs(n_ap - 20) <= 3
    # the exact top docs by a clear margin are approx-selected too
    top5 = [r["doc_id"] for r in sorted(ex, key=lambda r: -r["log_iw"])[:5]]
    assert all(ap[d] for d in top5)


def test_select_rejects_bad_method(spark):
    wts = dsir_log_weights(
        _df(spark, [("a", "s", "x y")]), F.col("source") == "s"
    )
    with pytest.raises(ValueError):
        dsir_select(wts, method="magic")


def test_report_partition_invariance(spark):
    rng = random.Random(17)
    vocab = [f"t{i}" for i in range(10)]
    rows = [
        (f"d{i}", f"s{i % 4}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20))))
        for i in range(60)
    ]
    def run(parts):
        out = dsir_report_per_source(
            _df(spark, rows, parts), F.col("source") == "s1", n_buckets=32
        ).collect()
        return sorted(
            (r["source"], r["n_docs"], round(r["mean_log_iw"], 9),
             r["n_pos"], r["n_selected"])
            for r in out
        )
    assert run(1) == run(7)
