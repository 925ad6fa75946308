"""Temperature-mixture invariants: quota allocation, realized-token
concentration, partition invariance, copy-count determinism, and the
alpha endpoints (alpha=1 ⇒ every source gets the same epoch multiplier;
alpha=0.5 upweights small sources)."""

import math

import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.mixture import (
    explode_epochs,
    realize_mixture,
    temperature_mixture_plan,
)


def _docs(spark):
    rows = (
        [("big", i, 50 + (i * 31) % 100) for i in range(600)]
        + [("mid", i, 40 + (i * 17) % 80) for i in range(150)]
        + [("small", i, 30 + (i * 7) % 60) for i in range(30)]
    )
    return spark.createDataFrame(rows, ["source", "doc_id", "n_tok"])


def test_plan_quota_allocation(spark):
    docs = _docs(spark)
    plan = {r["source"]: r for r in temperature_mixture_plan(docs).collect()}
    toks = {
        r["source"]: r["t"]
        for r in docs.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
    }
    total = sum(toks.values())
    budget = total * 3 // 2
    wsum = sum(math.sqrt(t) for t in toks.values())
    for src, r in plan.items():
        assert r["tok"] == toks[src]
        assert r["weight"] == pytest.approx(math.sqrt(toks[src]), rel=1e-12)
        assert r["quota"] == pytest.approx(
            budget * math.sqrt(toks[src]) / wsum, rel=1e-9
        )
        assert r["epochs"] == pytest.approx(r["quota"] / r["tok"], rel=1e-12)
        assert r["n_full"] == math.floor(r["epochs"])
        assert 0 <= r["frac_thr"] < 2**32
    # quotas exhaust the budget
    assert sum(r["quota"] for r in plan.values()) == pytest.approx(
        budget, rel=1e-9
    )
    # sqrt temperature: the small source gets MORE epochs than the big one
    assert plan["small"]["epochs"] > plan["mid"]["epochs"] > plan["big"]["epochs"]


def test_alpha_one_is_uniform_epochs(spark):
    plan = temperature_mixture_plan(_docs(spark), alpha=1.0).collect()
    es = [r["epochs"] for r in plan]
    assert all(e == pytest.approx(es[0], rel=1e-12) for e in es)
    assert es[0] == pytest.approx(1.5, rel=1e-6)


def test_realized_tokens_near_quota(spark):
    docs = _docs(spark)
    plan = temperature_mixture_plan(docs)
    got = {
        r["source"]: r
        for r in realize_mixture(docs, plan)
        .groupBy("source")
        .agg(
            F.sum(F.col("n_tok") * F.col("n_copies")).alias("rt"),
            F.max("n_copies").alias("mx"),
            F.min("n_copies").alias("mn"),
        )
        .collect()
    }
    for r in temperature_mixture_plan(docs).collect():
        rt = got[r["source"]]["rt"]
        # realized tokens are a Bernoulli(frac) thinning of one extra
        # epoch: sd ≈ max_tok·√(n/4) ≈ 1.8k on the big source — gate at
        # 5% relative, ~3σ here
        assert abs(rt - r["quota"]) < 0.05 * r["quota"], (
            r["source"],
            rt,
            r["quota"],
        )
        assert got[r["source"]]["mx"] - got[r["source"]]["mn"] <= 1
        assert got[r["source"]]["mn"] >= r["n_full"]


def test_partition_and_rerun_invariance(spark):
    docs = _docs(spark)
    a = sorted(
        map(
            tuple,
            realize_mixture(
                docs.repartition(17), temperature_mixture_plan(docs.repartition(17))
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            realize_mixture(
                docs.coalesce(1), temperature_mixture_plan(docs.coalesce(1))
            ).collect(),
        )
    )
    assert a == b


def test_explode_epochs_counts(spark):
    docs = _docs(spark)
    realized = realize_mixture(docs, temperature_mixture_plan(docs)).cache()
    n_rows = explode_epochs(realized).count()
    want = realized.agg(F.sum("n_copies")).collect()[0][0]
    assert n_rows == want
    # epoch ids are 0..n_copies-1 per doc
    mx = (
        explode_epochs(realized)
        .groupBy("source", "doc_id")
        .agg(F.max("epoch").alias("m"), F.count("*").alias("c"))
        .filter(F.col("m") != F.col("c") - 1)
        .count()
    )
    assert mx == 0


def test_fixed_budget_and_zero_copy_drop(spark):
    docs = _docs(spark)
    total = docs.agg(F.sum("n_tok")).collect()[0][0]
    # budget = an eighth of the corpus: every source lands below one
    # epoch (sqrt upweighting pushes the small source to ~0.55 — at a
    # quarter it would EXCEED one), so realization DROPS the
    # deterministic complement
    plan = temperature_mixture_plan(docs, token_budget=total // 8)
    for r in plan.collect():
        assert r["n_full"] == 0 and 0 < r["frac_thr"] < 2**32
    kept = realize_mixture(docs, plan)
    assert 0 < kept.count() < docs.count()
    assert kept.filter(F.col("n_copies") != 1).count() == 0


def test_vocab_coverage_curve(spark):
    """Coverage is monotone in k, exact on a hand-computable fixture, and
    total equals the corpus occurrence count."""
    from bloomine_spark.operators.textops import vocab_coverage

    docs = spark.createDataFrame(
        [
            (1, "a a a a b b c"),
            (2, "a b  c d"),      # double space → empty token dropped
            (3, "e"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["k"]: r for r in vocab_coverage(docs, ks=(1, 2, 10)).collect()}
    # freq: a=5 b=3 c=2 d=1 e=1 → total 12; ties d/e break by token string
    assert rows[1]["covered"] == 5 and rows[1]["total"] == 12
    assert rows[2]["covered"] == 8
    assert rows[10]["covered"] == 12 and rows[10]["vocab_size"] == 5
    assert rows[1]["coverage"] == 5 / 12
    assert rows[1]["coverage"] <= rows[2]["coverage"] <= rows[10]["coverage"]


def test_stratified_sample(spark):
    """Exact per-group quota, md5-deterministic, partition-invariant,
    groups smaller than the quota return whole."""
    from bloomine_spark.operators.sampling import stratified_sample

    rows = [(i, f"s{i % 3}", "x") for i in range(40)] + [(100, "tiny", "x")]
    docs = spark.createDataFrame(rows, ["doc_id", "source", "text"])
    s = stratified_sample(docs, 4).toPandas()
    counts = s.groupby("source")["doc_id"].count().to_dict()
    assert counts == {"s0": 4, "s1": 4, "s2": 4, "tiny": 1}
    assert set(s["sample_rank"]) <= {1, 2, 3, 4}

    a = sorted(map(tuple, s[["source", "doc_id", "sample_rank"]].values.tolist()))
    from pyspark.sql import functions as F
    s2 = stratified_sample(docs.repartition(17, F.col("doc_id")), 4).toPandas()
    b = sorted(map(tuple, s2[["source", "doc_id", "sample_rank"]].values.tolist()))
    assert a == b

    # md5 determinism: the python replay picks the same ids
    import hashlib
    for g in ("s0", "s1", "s2"):
        ids = [i for i, src, _ in rows if src == g]
        exp = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), str(i)))[:4]
        got = sorted(s[s["source"] == g]["doc_id"], key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), str(i)))
        assert list(got) == exp
