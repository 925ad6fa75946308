"""Vectorized datagen must be byte-identical to the per-row reference
implementation, and partition-independent (pure function of row id)."""

import numpy as np

from bloomine_spark.datagen import generate_rows, generate_rows_reference


def test_vectorized_equals_reference():
    ids = np.concatenate([np.arange(0, 500), np.arange(10_000, 10_100)])
    fast = generate_rows(ids, seed=42)
    slow = generate_rows_reference(ids, seed=42)
    assert list(fast["doc_id"]) == list(slow["doc_id"])
    assert list(fast["source"]) == list(slow["source"])
    assert (fast["n_tok"].to_numpy() == slow["n_tok"].to_numpy()).all()
    for a, b in zip(fast["tokens"], slow["tokens"]):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_partition_independence():
    whole = generate_rows(np.arange(300), seed=7)
    parts = [generate_rows(ids, seed=7) for ids in np.array_split(np.arange(300), 7)]
    import pandas as pd

    stitched = pd.concat(parts, ignore_index=True)
    assert list(whole["doc_id"]) == list(stitched["doc_id"])
    for a, b in zip(whole["tokens"], stitched["tokens"]):
        assert (np.asarray(a) == np.asarray(b)).all()


def test_composition_has_all_categories():
    pdf = generate_rows(np.arange(2000), seed=42)
    from bloomine_spark.datagen import DEFAULT_TARGET

    tgt = np.asarray(DEFAULT_TARGET)

    def contains(a, pat):
        a = np.asarray(a)
        if len(a) < len(pat):
            return False
        w = np.lib.stride_tricks.sliding_window_view(a, len(pat))
        return bool((w == pat).all(axis=1).any())

    n_exact = sum(contains(t, tgt) for t in pdf["tokens"])
    n_rev = sum(contains(t, tgt[::-1]) for t in pdf["tokens"])
    assert n_exact > 50 and n_rev > 50
    # skew: src0 holds roughly half the rows
    frac0 = (pdf["source"] == "src0").mean()
    assert 0.42 < frac0 < 0.58
