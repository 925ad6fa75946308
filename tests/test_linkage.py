"""Entity-resolution / record-linkage operators: fingerprint keys,
blocked edit-distance pairs, pair→cluster→canonical resolution."""

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.linkage import (
    blocked_edit_pairs,
    fingerprint_clusters,
    fingerprint_key,
    resolve_entities,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_fingerprint_key_normalizes(spark):
    got = (
        spark.range(1)
        .select(
            fingerprint_key(
                F.lit("  The,, QUICK--brown FOX!! fox the ")
            ).alias("k")
        )
        .head()[0]
    )
    # lowercase, punct stripped, token-sorted, token-deduped
    assert got == "brown fox quick the"


def test_fingerprint_clusters_collide_on_noise(spark):
    df = _df(
        spark,
        [
            (1, "alpha beta gamma"),
            (2, "Gamma, BETA alpha!"),  # same fingerprint
            (3, "alpha beta delta"),
        ],
    )
    out = {r["id"]: r for r in fingerprint_clusters(df).collect()}
    assert out[1]["fingerprint"] == out[2]["fingerprint"]
    assert out[1]["cluster_size"] == 2 and out[3]["cluster_size"] == 1
    assert out[2]["canonical_id"] == 1
    assert out[1]["keep"] and not out[2]["keep"] and out[3]["keep"]


def test_blocked_edit_pairs_plants_and_threshold(spark):
    df = _df(
        spark,
        [
            (1, "goldenrod lavender spring"),
            (2, "goldenrod lavender sprint"),  # dist 1, same first word
            (3, "goldenrod lavender xyzzy plugh"),  # dist > 2
            (4, "blue steel"),
            (5, "blue steel"),  # exact dup -> dist 0
        ],
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in blocked_edit_pairs(df, max_dist=2).collect()
    }
    assert pairs == {(1, 2): 1, (4, 5): 0}


def test_blocked_edit_pairs_cross_block_missed(spark):
    # dist 1 but the edit hits the blocking token -> documented miss
    df = _df(spark, [(1, "alpha beta"), (2, "alphx beta")])
    assert blocked_edit_pairs(df, max_dist=2).count() == 0


def test_blocked_edit_pairs_block_cap_raises(spark):
    # "aaa" is each text's min token -> every row lands in one block
    df = _df(spark, [(i, f"aaa hot text row{i}") for i in range(30)])
    with pytest.raises(ValueError, match="max_block"):
        blocked_edit_pairs(df, max_dist=2, max_block=10)


def test_blocked_edit_pairs_custom_block_column(spark):
    df = spark.createDataFrame(
        [(1, "abc", "k"), (2, "abd", "k"), (3, "abe", "other")],
        ["doc_id", "text", "blk"],
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in blocked_edit_pairs(df, block="blk", max_dist=1).collect()
    }
    assert got == {(1, 2)}


def test_resolve_entities_transitive(spark):
    # A~B and B~C must land in ONE group of 3 with min-id canonical
    df = _df(
        spark,
        [
            (1, "node one"),
            (2, "node one x"),
            (3, "node one xy"),
            (4, "unrelated thing"),
        ],
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], ["id_a", "id_b"]
    )
    out = {r["doc_id"]: r for r in resolve_entities(df, pairs).collect()}
    assert (
        out[1]["group_id"] == out[2]["group_id"] == out[3]["group_id"] == 1
    )
    assert out[1]["group_size"] == 3
    assert out[1]["keep"] and not out[2]["keep"] and not out[3]["keep"]
    assert out[4]["group_size"] == 1 and out[4]["keep"]


def test_resolve_entities_quality_survivor(spark):
    df = spark.createDataFrame(
        [(1, "a", 0.1), (2, "b", 0.9), (3, "c", 0.5)],
        ["doc_id", "text", "q"],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["id_a", "id_b"])
    out = {
        r["doc_id"]: r["keep"]
        for r in resolve_entities(df, pairs, quality_col="q").collect()
    }
    assert out == {1: False, 2: True, 3: False}
