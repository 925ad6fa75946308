"""Cross-document duplicated-span family (Lee et al. 2022 ExactSubstr at
window granularity): hand-computed coverage on planted duplicates, island
merging of overlapping windows, trim keep-first / keep-none semantics,
and partition invariance."""

from __future__ import annotations

import random

import pytest

from bloomine_spark.operators.dedup import (
    dup_span_coverage,
    dup_span_coverage_per_source,
    trim_dup_spans,
)


def _docs(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "doc_id string, source string, text string")
    return df.repartition(parts) if parts > 1 else df


PHRASE = "alpha beta gamma delta"  # 4 tokens — used with k=4


def test_planted_duplicate_coverage(spark):
    # The 4-token phrase appears in docs a and b; everything else unique.
    rows = [
        ("a", "s1", f"u1 u2 {PHRASE} u3 u4"),
        ("b", "s1", f"v1 {PHRASE} v2 v3 v4 v5"),
        ("c", "s2", "w1 w2 w3 w4 w5 w6 w7 w8"),
    ]
    out = {
        r["doc_id"]: r
        for r in dup_span_coverage(_docs(spark, rows), k=4).collect()
    }
    assert out["a"]["n_tok"] == 8 and out["a"]["dup_tok"] == 4
    assert out["b"]["n_tok"] == 9 and out["b"]["dup_tok"] == 4
    assert out["c"]["dup_tok"] == 0
    assert out["a"]["dup_frac"] == 0.5


def test_overlapping_windows_island_merged(spark):
    # 5-token shared run -> two overlapping k=4 windows in each doc;
    # coverage must be 5 (the island), not 8 (window sum).
    run = "p q r s t"
    rows = [
        ("a", "s1", f"x1 {run} x2"),
        ("b", "s1", f"y1 y2 {run}"),
    ]
    out = {
        r["doc_id"]: r
        for r in dup_span_coverage(_docs(spark, rows), k=4).collect()
    }
    assert out["a"]["dup_tok"] == 5
    assert out["b"]["dup_tok"] == 5


def test_intra_doc_repeat_counts_as_duplicate(spark):
    # The window occurs twice in ONE doc — still duplicated (corpus
    # count >= 2), both occurrences covered.
    rows = [("a", "s1", f"{PHRASE} z1 z2 {PHRASE}")]
    out = dup_span_coverage(_docs(spark, rows), k=4).collect()[0]
    assert out["dup_tok"] == 8


def test_short_and_empty_docs(spark):
    rows = [("a", "s1", "one two"), ("b", "s1", ""), ("c", "s1", "one two")]
    out = {
        r["doc_id"]: r
        for r in dup_span_coverage(_docs(spark, rows), k=4).collect()
    }
    assert all(out[d]["dup_tok"] == 0 for d in "abc")
    assert out["b"]["n_tok"] == 0 and out["b"]["dup_frac"] == 0.0


def test_per_source_rollup(spark):
    rows = [
        ("a", "s1", f"u1 u2 {PHRASE} u3 u4"),          # 4/8 dup -> half
        ("b", "s1", f"v1 {PHRASE} v2 v3 v4 v5"),       # 4/9 dup
        ("c", "s2", "w1 w2 w3 w4 w5 w6 w7 w8"),
    ]
    out = {
        r["source"]: r
        for r in dup_span_coverage_per_source(_docs(spark, rows), k=4).collect()
    }
    s1 = out["s1"]
    assert (s1["n_docs"], s1["n_tok"], s1["dup_tok"]) == (2, 17, 8)
    assert s1["n_docs_any_dup"] == 2 and s1["n_docs_half_dup"] == 1
    assert out["s2"]["dup_tok"] == 0 and out["s2"]["n_docs_any_dup"] == 0


def test_trim_keep_first(spark):
    rows = [
        ("a", "s1", f"u1 u2 {PHRASE} u3 u4"),
        ("b", "s1", f"v1 {PHRASE} v2 v3 v4 v5"),
        ("c", "s2", "w1 w2 w3 w4 w5 w6 w7 w8"),
    ]
    out = {
        r["doc_id"]: r
        for r in trim_dup_spans(_docs(spark, rows), k=4).collect()
    }
    # Canonical (min (doc_id, start)) occurrence is in doc a -> a intact.
    assert out["a"]["text"] == f"u1 u2 {PHRASE} u3 u4"
    assert out["a"]["n_removed"] == 0
    # b loses exactly the phrase tokens, order preserved.
    assert out["b"]["text"] == "v1 v2 v3 v4 v5"
    assert out["b"]["n_removed"] == 4
    assert out["c"]["n_removed"] == 0


def test_trim_keep_none(spark):
    rows = [
        ("a", "s1", f"u1 u2 {PHRASE} u3 u4"),
        ("b", "s1", f"v1 {PHRASE} v2 v3 v4 v5"),
    ]
    out = {
        r["doc_id"]: r
        for r in trim_dup_spans(_docs(spark, rows), k=4, keep="none").collect()
    }
    assert out["a"]["text"] == "u1 u2 u3 u4" and out["a"]["n_removed"] == 4
    assert out["b"]["text"] == "v1 v2 v3 v4 v5" and out["b"]["n_removed"] == 4


def test_trim_protects_overlap_of_canonical(spark):
    # Doc a holds the canonical copy; a second duplicated window inside
    # doc a overlapping the canonical span must not delete its tokens.
    rows = [
        ("a", "s1", f"{PHRASE} tail1 tail2"),
        ("b", "s1", f"pre1 pre2 {PHRASE}"),
        ("c", "s1", f"{PHRASE} other1 other2"),
    ]
    out = {
        r["doc_id"]: r
        for r in trim_dup_spans(_docs(spark, rows), k=4).collect()
    }
    assert out["a"]["n_removed"] == 0          # canonical copy survives
    assert out["b"]["text"] == "pre1 pre2"
    assert out["c"]["text"] == "other1 other2"


def test_trim_rejects_bad_keep(spark):
    with pytest.raises(ValueError):
        trim_dup_spans(_docs(spark, [("a", "s", "x")]), keep="both")


def test_partition_invariance(spark):
    rng = random.Random(7)
    vocab = [f"t{i}" for i in range(12)]
    rows = [
        (f"d{i}", f"s{i % 3}",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 30))))
        for i in range(60)
    ]
    a = sorted(
        map(tuple, dup_span_coverage_per_source(_docs(spark, rows, 1), k=5)
            .collect())
    )
    b = sorted(
        map(tuple, dup_span_coverage_per_source(_docs(spark, rows, 7), k=5)
            .collect())
    )
    assert a == b


def test_trim_conservation_fuzz(spark):
    # Trimmed token count + removed == original; keep="first" never
    # removes the globally-first occurrence of any duplicated window.
    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(8)]
    rows = [
        (f"d{i:02d}", "s0",
         " ".join(rng.choice(vocab) for _ in range(rng.randint(4, 20))))
        for i in range(40)
    ]
    k = 4
    out = trim_dup_spans(_docs(spark, rows), k=k).collect()
    orig = {d: [x for x in t.split(" ") if x] for d, _, t in rows}
    for r in out:
        assert r["n_tok"] + r["n_removed"] == len(orig[r["doc_id"]])
    # Every duplicated gram still occurs somewhere in the trimmed corpus.
    from collections import Counter

    grams = Counter()
    for w in orig.values():
        for s in range(len(w) - k + 1):
            grams[" ".join(w[s:s + k])] += 1
    trimmed_text = " | ".join(r["text"] for r in out)
    for g, c in grams.items():
        if c >= 2:
            assert g in trimmed_text
