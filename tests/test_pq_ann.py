"""Product quantization ANN (Jégou 2011): codebook determinism, encode
contract, ADC score fidelity, refined recall vs the exact baseline."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.similarity import (
    brute_force_topk,
    pq_encode,
    pq_topk,
    train_pq_codebooks,
)

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata absent")


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _queries(pdf, n=5):
    ids = pdf["vec_id"].to_numpy()
    return [
        (int(ids[i]), list(map(float, pdf["embedding"][i]))) for i in range(n)
    ]


@needs_data
def test_codebooks_partitioning_invariant(spark):
    emb = _emb(spark)
    a = train_pq_codebooks(emb, m=8, ksub=16)
    b = train_pq_codebooks(emb.repartition(13), m=8, ksub=16)
    assert a.shape == (8, 16, 8)
    np.testing.assert_array_equal(a, b)


@needs_data
def test_m_must_divide_dim(spark):
    with pytest.raises(ValueError, match="must divide"):
        train_pq_codebooks(_emb(spark), m=7)


@needs_data
def test_encode_contract(spark):
    emb = _emb(spark)
    books = train_pq_codebooks(emb, m=8, ksub=16)
    codes = pq_encode(emb, books).toPandas()
    assert len(codes) == emb.count()
    cm = np.array(list(codes["codes"]))
    assert cm.shape[1] == 8
    assert cm.min() >= 0 and cm.max() < 16
    # encoding is deterministic under repartitioning
    codes2 = pq_encode(emb.repartition(9), books).toPandas()
    m1 = dict(zip(codes["vec_id"], map(tuple, codes["codes"])))
    m2 = dict(zip(codes2["vec_id"], map(tuple, codes2["codes"])))
    assert m1 == m2


@needs_data
def test_adc_score_approximates_cosine(spark):
    """ADC is Σ_j q_j·c_j[code] — the inner product against the
    RECONSTRUCTED vector, so |adc − cosine| is bounded by the
    quantization error. Pin the mean error small at m=16, ksub=64."""
    emb = _emb(spark)
    pdf = emb.toPandas()
    books = train_pq_codebooks(emb, m=16, ksub=64)
    codes = pq_encode(emb, books)
    qs = _queries(pdf, 3)
    adc = pq_topk(codes, qs, books, k=10).toPandas()
    mat = np.array(list(pdf["embedding"]), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = list(pdf["vec_id"])
    pos = {v: i for i, v in enumerate(ids)}
    errs = []
    for _, r in adc.iterrows():
        q = np.array(dict(qs)[r["query_id"]], dtype=np.float64)
        q /= np.linalg.norm(q)
        true = float(q @ mat[pos[r["neighbor_id"]]])
        errs.append(abs(true - r["score"]))
    assert np.mean(errs) < 0.08
    assert np.max(errs) < 0.25


@needs_data
def test_refined_topk_recall_and_exact_scores(spark):
    emb = _emb(spark)
    pdf = emb.toPandas()
    qs = _queries(pdf, 5)
    books = train_pq_codebooks(emb, m=16, ksub=256)
    codes = pq_encode(emb, books)
    exact = brute_force_topk(emb, qs, k=10).toPandas()
    ref = pq_topk(codes, qs, books, k=10, emb=emb, refine=8).toPandas()
    hit = tot = 0
    for qid in {q for q, _ in qs}:
        t = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(ref[ref["query_id"] == qid]["neighbor_id"])
        hit += len(t & a)
        tot += len(t)
    assert hit / tot >= 0.9
    # refined scores are TRUE cosines: match the exact baseline wherever
    # the same (query, neighbor) pair appears
    key = lambda df: dict(
        zip(zip(df["query_id"], df["neighbor_id"]),
            df.get("score", df.get("cosine")))
    )
    e, r = key(exact), key(ref)
    for pair in set(e) & set(r):
        assert r[pair] == pytest.approx(e[pair], abs=1e-6)


@needs_data
def test_adc_beats_chance_unrefined(spark):
    """Raw ADC (refine=1) must carry real signal: recall well above the
    10/N chance level even on the near-random fixture."""
    emb = _emb(spark)
    pdf = emb.toPandas()
    qs = _queries(pdf, 5)
    books = train_pq_codebooks(emb, m=16, ksub=256)
    codes = pq_encode(emb, books)
    exact = brute_force_topk(emb, qs, k=10).toPandas()
    adc = pq_topk(codes, qs, books, k=10).toPandas()
    hit = tot = 0
    for qid in {q for q, _ in qs}:
        t = set(exact[exact["query_id"] == qid]["neighbor_id"])
        a = set(adc[adc["query_id"] == qid]["neighbor_id"])
        hit += len(t & a)
        tot += len(t)
    assert hit / tot >= 0.5
