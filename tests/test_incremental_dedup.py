"""Incremental dedup: screen new batches against a persisted corpus
index (exact fingerprints + MinHash band buckets + signatures)."""

import pandas as pd
import pytest

from bloomine_spark.operators.dedup import (
    build_dedup_index,
    screen_against_index,
)

BASE = ("the quick brown fox jumps over a lazy dog and then runs far "
        "away past the old barn until night comes and a quiet wind "
        "settles over the distant hills near the river bend tonight")


def _corpus(spark):
    rows = [
        {"doc_id": i, "text": f"{BASE} corpus tail {i} with words "
                              f"{i * 7} and {i * 13} apart"}
        for i in range(20)
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_screen_exact_near_and_novel(spark, tmp_path):
    idx = str(tmp_path / "dedup_idx")
    build_dedup_index(_corpus(spark), idx, num_perm=64, bands=16)

    batch = spark.createDataFrame(pd.DataFrame([
        # exact copy of corpus doc 3
        {"doc_id": 1001, "text": f"{BASE} corpus tail 3 with words 21 "
                                 "and 39 apart"},
        # near-dup of corpus doc 5 (one word swapped)
        {"doc_id": 1002, "text": (f"{BASE} corpus tail 5 with words 35 "
                                  "and 65 apart").replace("quick", "swift")},
        # novel doc
        {"doc_id": 1003, "text": "entirely different content about "
                                 "astronomy telescopes and distant stars "
                                 "observed through long winter nights"},
        # shorter than the shingle width: no signature, exact-only path
        {"doc_id": 1004, "text": "tiny"},
    ]))
    out = {r["doc_id"]: r for r in
           screen_against_index(batch, idx, threshold=0.7).collect()}
    assert out[1001]["reason"] == "exact"
    assert out[1001]["matched_id"] == 3
    assert not out[1001]["keep"]
    assert out[1001]["est_jaccard"] is None  # exact path carries no est
    assert out[1002]["reason"] == "near"
    assert out[1002]["matched_id"] == 5
    assert out[1002]["est_jaccard"] >= 0.7
    assert out[1003]["keep"] and out[1003]["reason"] is None
    assert out[1004]["keep"]  # no signature -> cannot near-match


def test_screen_exact_only_mode(spark, tmp_path):
    idx = str(tmp_path / "dedup_idx2")
    build_dedup_index(_corpus(spark), idx)
    batch = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 2001, "text": (f"{BASE} corpus tail 5 with words 35 "
                                  "and 65 apart").replace("quick", "swift")},
    ]))
    out = screen_against_index(batch, idx, threshold=None).collect()[0]
    assert out["keep"]  # near path disabled: the near-dup passes


def test_index_rebuild_overwrites(spark, tmp_path):
    idx = str(tmp_path / "dedup_idx3")
    build_dedup_index(_corpus(spark), idx)
    # rebuild with a DIFFERENT banding; screen must replay the new params
    m = build_dedup_index(_corpus(spark), idx, num_perm=128, bands=32)
    assert m == {"n": 3, "num_perm": 128, "bands": 32, "version": 1}
    batch = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 3001, "text": f"{BASE} corpus tail 7 with words 49 "
                                 "and 91 apart"},
    ]))
    out = screen_against_index(batch, idx).collect()[0]
    assert out["reason"] == "exact" and out["matched_id"] == 7


def test_index_remote_manifest_fallback(spark, tmp_path):
    # a file: URI makes local open() fail, exercising the Hadoop-FS
    # sibling manifest path on BOTH build and screen (the IVF pattern)
    idx = "file://" + str(tmp_path / "dedup_idx4")
    build_dedup_index(_corpus(spark), idx)
    build_dedup_index(_corpus(spark), idx)  # rebuild: delete-then-write
    batch = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 4001, "text": f"{BASE} corpus tail 0 with words 0 "
                                 "and 0 apart"},
    ]))
    out = screen_against_index(batch, idx).collect()[0]
    assert out["reason"] == "exact" and out["matched_id"] == 0


def test_build_validates_banding(spark, tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        build_dedup_index(_corpus(spark), str(tmp_path / "x"),
                          num_perm=64, bands=15)


def test_snapshot_diff_statuses(spark):
    from bloomine_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "before"},
        {"doc_id": 3, "text": "gone"},
    ]))
    new = spark.createDataFrame(pd.DataFrame([
        {"doc_id": 1, "text": "same"},
        {"doc_id": 2, "text": "after"},
        {"doc_id": 4, "text": "fresh"},
    ]))
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_source_overlap_matrix_counts(spark):
    from bloomine_spark.operators.dedup import source_overlap_matrix

    rows = [
        # s0 and s1 share two bodies; s2 shares one with s0 only;
        # duplicate copies within one source count ONCE (distinct fp)
        {"doc_id": 1, "source": "s0", "text": "x"},
        {"doc_id": 2, "source": "s0", "text": "x"},
        {"doc_id": 3, "source": "s0", "text": "y"},
        {"doc_id": 4, "source": "s0", "text": "z"},
        {"doc_id": 5, "source": "s1", "text": "x"},
        {"doc_id": 6, "source": "s1", "text": "y"},
        {"doc_id": 7, "source": "s2", "text": "z"},
        {"doc_id": 8, "source": "s2", "text": "w"},
    ]
    got = {(r["source_a"], r["source_b"]): r["n_shared"]
           for r in source_overlap_matrix(
               spark.createDataFrame(pd.DataFrame(rows))).collect()}
    assert got[("s0", "s0")] == 3        # x, y, z (dup x counts once)
    assert got[("s1", "s1")] == 2
    assert got[("s2", "s2")] == 2
    assert got[("s0", "s1")] == 2        # x, y
    assert got[("s0", "s2")] == 1        # z
    assert ("s1", "s2") not in got       # nothing shared


def test_snapshot_diff_null_text(spark):
    # review finding: presence must come from the id, not md5(text) —
    # NULL text on both sides is 'unchanged', NULL->value is 'changed'
    from bloomine_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": None},
                      {"doc_id": 2, "text": None}]).astype({"text": "object"})
    )
    new = spark.createDataFrame(
        pd.DataFrame([{"doc_id": 1, "text": None},
                      {"doc_id": 2, "text": "now set"}]).astype({"text": "object"})
    )
    got = {r["doc_id"]: r["status"]
           for r in snapshot_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed"}
