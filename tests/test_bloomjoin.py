"""Bloom semi-join: exact equivalence to a plain semi-join, and the
prefilter must actually prune the big side before the exchange."""

import os

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.bloomjoin import bloom_semi_join, build_key_bloom

SF = "/root/testdata/sf0.001"
needs_data = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata absent")


@needs_data
def test_bloom_semi_join_equals_plain_semi_join(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    small = orders.filter(F.col("o_totalprice") > 300000).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    got = (
        bloom_semi_join(li, small, "l_orderkey")
        .select("l_orderkey", "l_linenumber")
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    want = (
        li.join(small, "l_orderkey", "left_semi")
        .select("l_orderkey", "l_linenumber")
        .toPandas()
        .sort_values(["l_orderkey", "l_linenumber"])
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert len(want) > 0


@needs_data
def test_bloom_prefilter_prunes_big_side(spark):
    """With a selective build side, the Bloom must kill almost all of the
    big side pre-shuffle (FP rate 1e-4 → survivors ≈ true matches)."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    small = orders.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_orderkey").alias("l_orderkey")
    )
    n_big = li.count()
    n_true = li.join(small, "l_orderkey", "left_semi").count()

    bloom = build_key_bloom(small, "l_orderkey", fp=1e-4)
    bc = spark.sparkContext.broadcast(bloom.to_bytes())
    import numpy as np

    from bloomine_spark.sketch.bloom import BloomFilter

    hashed = li.withColumn("_kh", F.xxhash64("l_orderkey"))

    def count_hits(pdf_iter):
        import pandas as pd

        bf = BloomFilter.from_bytes(bc.value)
        for pdf in pdf_iter:
            kh = pdf["_kh"].to_numpy().astype(np.uint64)
            yield pd.DataFrame({"n": [int(bf.contains_hashes(kh).sum())]})

    survivors = (
        hashed.select("_kh").mapInPandas(count_hits, schema="n long")
        .agg(F.sum("n")).head()[0]
    )
    # survivors = true matches + FPs; FP budget = 1e-4 of non-matches + slack
    assert n_true <= survivors <= n_true + max(10, int(2e-3 * n_big))
    assert survivors < n_big // 2  # the prefilter genuinely prunes
