"""CCNet normalization + deterministic hash sampling: replay equality,
stability/independence properties."""

from __future__ import annotations

import hashlib
import re

import pytest

from bloomine_spark.operators.textops import ccnet_normalize, sample_by_hash


def _norm(t: str) -> str:
    t = t.lower()
    t = re.sub("[0-9]", "0", t)
    t = re.sub("[\t\n\r\x0b\x0c]", " ", t)
    t = re.sub("[\x00-\x1f\x7f]", "", t)
    return re.sub(" +", " ", t).strip()


def test_normalize_cases(spark):
    texts = [
        "Hello WORLD 123",
        "tabs\tand\nnewlines  plus   runs",
        "  padded  ",
        "",
        "price 42,99 on 2026-08-18",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in ccnet_normalize(df).collect()}
    for i, t in enumerate(texts):
        exp = _norm(t)
        assert got[i]["text"] == exp, (i, got[i]["text"], exp)
        assert got[i]["n_chars_raw"] == len(t)
        assert got[i]["n_chars_norm"] == len(exp)
    # concrete: digits folded, case folded, runs collapsed
    assert got[0]["text"] == "hello world 000"
    assert got[4]["text"] == "price 00,00 on 0000-00-00"


def test_sample_by_hash_matches_md5_and_is_stable(spark):
    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(2000)], "doc_id long, text string"
    )
    kept = {r["doc_id"] for r in sample_by_hash(df, 0.25, salt="s1").collect()}
    exp = {
        i for i in range(2000)
        if int(hashlib.md5(f"s1:{i}".encode()).hexdigest()[:8], 16)
        < int(0.25 * (1 << 32))
    }
    assert kept == exp
    assert 0.2 < len(kept) / 2000 < 0.3
    # stability under corpus growth: the kept subset of a prefix equals
    # the prefix of the kept set
    half = {r["doc_id"] for r in sample_by_hash(
        df.filter("doc_id < 1000"), 0.25, salt="s1").collect()}
    assert half == {i for i in kept if i < 1000}
    # different salts give (near-)independent samples
    other = {r["doc_id"] for r in sample_by_hash(df, 0.25, salt="s2").collect()}
    inter = len(kept & other) / 2000
    assert 0.02 < inter < 0.12          # ~0.0625 expected
    # edges
    assert sample_by_hash(df, 0.0).count() == 0
    assert sample_by_hash(df, 1.0).count() == 2000
    with pytest.raises(ValueError):
        sample_by_hash(df, 1.5)
