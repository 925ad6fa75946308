"""Sequence-packing + hash-split invariants: token conservation, chunk
fullness, split accounting, partition invariance, and the growth-stable
split guarantee that makes contamination auditable."""

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.packing import hash_split, pack_context_windows

L = 128


def _docs(spark):
    rows = [
        ("s0", i, 1 + (i * 7919) % 200) for i in range(400)
    ] + [("s1", i, 1 + (i * 104729) % 300) for i in range(250)]
    return spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])


def test_packing_conservation_and_fullness(spark):
    docs = _docs(spark).cache()
    chunks = pack_context_windows(docs, L).cache()

    # token conservation per source
    want = {
        r["source"]: r["t"]
        for r in docs.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    got = {
        r["source"]: r["t"]
        for r in chunks.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert got == want

    # every chunk is exactly full except each source's final one
    last = {
        r["source"]: r["m"]
        for r in chunks.groupBy("source")
        .agg(F.max("chunk_id").alias("m"))
        .collect()
    }
    for r in chunks.collect():
        if r["chunk_id"] < last[r["source"]]:
            assert r["n_tokens"] == L, r
        else:
            assert 1 <= r["n_tokens"] <= L, r
        assert r["n_docs"] >= 1

    # chunk ids are dense 0..last
    for src, m in last.items():
        ids = sorted(
            r["chunk_id"]
            for r in chunks.filter(F.col("source") == src).collect()
        )
        assert ids == list(range(m + 1))

    # split accounting: each doc occupies 1 + (#boundary crossings INTO a
    # later chunk) chunk rows, so Σn_docs − #docs == Σn_split_docs
    tot = chunks.agg(
        F.sum("n_docs").alias("nd"), F.sum("n_split_docs").alias("ns")
    ).collect()[0]
    assert tot["nd"] - docs.count() == tot["ns"]
    assert tot["ns"] > 0  # the fixture really does split docs


def test_packing_partition_invariant(spark):
    docs = _docs(spark)
    a = pack_context_windows(docs.repartition(13), L).collect()
    b = pack_context_windows(docs.coalesce(1), L).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_packing_doc_longer_than_window(spark):
    """A single doc longer than the window spans multiple full chunks."""
    docs = spark.createDataFrame(
        [("s", 1, 300), ("s", 2, 10)], ["source", "doc_id", "n_tok"]
    )
    chunks = {
        r["chunk_id"]: r
        for r in pack_context_windows(docs, 128).collect()
    }
    assert chunks[0]["n_tokens"] == 128 and chunks[0]["n_docs"] == 1
    assert chunks[1]["n_tokens"] == 128 and chunks[1]["n_split_docs"] == 1
    assert chunks[2]["n_tokens"] == 300 + 10 - 256
    assert chunks[2]["n_docs"] == 2 and chunks[2]["n_split_docs"] == 1


def test_hash_split_stability_and_widths(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(5000)], ["doc_id", "text"]
    )
    full = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert set(full.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0.95 < n_train / 5000 < 0.995  # ~98% ± bucket granularity

    # growth stability: a doc's split never changes when the corpus shrinks
    # or grows — it is a pure function of the id
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r["doc_id"]: r["split"] for r in hash_split(subset).collect()}
    assert all(full[k] == v for k, v in sub.items())

    with pytest.raises(ValueError):
        hash_split(docs, splits=(("a", 50), ("b", 20))).collect()


def test_sharded_packing(spark):
    """Sharded mode: per-(source, shard) streams partition the docs, token
    totals are conserved, every non-final chunk per shard is full, and
    the window partition keys now include the shard (parallelism =
    sources x shards)."""
    docs = _docs(spark).cache()
    S = 4
    chunks = pack_context_windows(docs, L, shards=S).cache()

    want = {
        r["source"]: r["t"]
        for r in docs.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    got = {
        r["source"]: r["t"]
        for r in chunks.groupBy("source")
        .agg(F.sum("n_tokens").alias("t"))
        .collect()
    }
    assert got == want

    last = {
        (r["source"], r["shard"]): r["m"]
        for r in chunks.groupBy("source", "shard")
        .agg(F.max("chunk_id").alias("m"))
        .collect()
    }
    assert len(last) == 2 * S  # every shard of both sources is populated
    for r in chunks.collect():
        if r["chunk_id"] < last[(r["source"], r["shard"])]:
            assert r["n_tokens"] == L, r
        else:
            assert 1 <= r["n_tokens"] <= L, r

    # fullness cost is bounded: <= 1 partial chunk per (source, shard)
    partial = chunks.filter(F.col("n_tokens") < L).count()
    assert partial <= 2 * S

    # shard assignment is a pure function of doc_id: invariant across
    # partitionings
    a = sorted(map(tuple, pack_context_windows(docs.repartition(11), L, shards=S).collect()))
    b = sorted(map(tuple, chunks.collect()))
    assert a == b
