"""Priority sampling sketch (Duffield–Lund–Thorup 2007): deterministic
md5-uniform priorities, per-group top-k, τ-calibrated subset-sum
estimator. Mergeability and repartition-invariance are exact properties
(the sample is a pure function of keys), pinned here; estimator accuracy
is pinned on the fixed fixture (no RNG — the numbers cannot drift)."""

import pytest
from pyspark.sql import functions as F

from bloomine_spark.sketch.priority import priority_sample


def _fixture(spark, n=8000):
    return spark.range(0, n).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 5).cast("string").alias("source"),
        (F.col("id") % 113 + 1).alias("wt"),
    )


def test_exact_when_group_fits(spark):
    df = _fixture(spark, 40)  # 8 rows per group, k=16 > 8
    out = priority_sample(df, 16, "wt", group_col="source").toPandas()
    true = (
        df.groupBy("source").agg(F.sum("wt").alias("t"))
        .toPandas().set_index("source")["t"]
    )
    got = out.groupby("source")["est_weight"].sum()
    for g in true.index:
        assert got[g] == pytest.approx(float(true[g]))
    # τ = 0 branch: every estimator term is the raw weight
    assert (out["est_weight"] == out["weight"]).all()


def test_estimator_accuracy_on_fixture(spark):
    df = _fixture(spark)
    out = priority_sample(df, 64, "wt", group_col="source").toPandas()
    assert len(out) == 5 * 64
    true = (
        df.groupBy("source").agg(F.sum("wt").alias("t"))
        .toPandas().set_index("source")["t"]
    )
    est = out.groupby("source")["est_weight"].sum()
    for g in true.index:
        ratio = est[g] / float(true[g])
        assert 0.75 < ratio < 1.25, (g, ratio)
    # pooled estimate is tighter than any single group
    assert est.sum() / float(true.sum()) == pytest.approx(1.0, abs=0.12)


def test_repartition_invariance(spark):
    df = _fixture(spark, 2000)
    a = priority_sample(df, 20, "wt", group_col="source").toPandas()
    b = priority_sample(
        df.repartition(7), 20, "wt", group_col="source"
    ).toPandas()
    key = ["source", "rank"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)


def test_merge_is_resample_of_union(spark):
    """Tree-merge property: top-k(union of per-part top-k) == direct
    top-k, INCLUDING τ — the union of per-part top-(k+1) retains the
    global (k+1)-th priority, which priority_sample recomputes (the
    priority is a pure function of the key, so re-sampling the union IS
    the merge)."""
    df = _fixture(spark, 3000)
    k = 25
    part1 = df.filter("doc_id % 2 = 0")
    part2 = df.filter("doc_id % 2 = 1")
    # per-part sketches keep k+1 rows via k'=k+1 (state = top-(k+1))
    s1 = priority_sample(part1, k + 1, "wt", group_col="source")
    s2 = priority_sample(part2, k + 1, "wt", group_col="source")
    union = s1.unionByName(s2).select("source", "doc_id", "weight")
    merged = priority_sample(
        union.withColumnRenamed("weight", "w0"), k, "w0", group_col="source"
    ).toPandas()
    direct = priority_sample(df, k, "wt", group_col="source").toPandas()
    key = ["source", "rank"]
    merged = merged.sort_values(key).reset_index(drop=True)
    direct = direct.sort_values(key).reset_index(drop=True)
    assert merged[["source", "doc_id", "weight", "rank"]].equals(
        direct[["source", "doc_id", "weight", "rank"]]
    )
    assert merged["est_weight"].tolist() == pytest.approx(
        direct["est_weight"].tolist()
    )


def test_merge_needs_kplus1_state(spark):
    """The wt column ('wt') must survive union for merge; also k=1 edge."""
    df = _fixture(spark, 50)
    out = priority_sample(df, 1, "wt", group_col="source").toPandas()
    assert len(out) == 5 and (out["rank"] == 1).all()
    # τ is the 2nd priority, so est_weight >= weight strictly when a
    # competitor exists
    assert (out["est_weight"] >= out["weight"]).all()


def test_global_sample_no_group(spark):
    df = _fixture(spark, 500)
    out = priority_sample(df, 10, "wt").toPandas()
    assert len(out) == 10
    total = df.groupBy().sum("wt").collect()[0][0]
    assert out["est_weight"].sum() == pytest.approx(total, rel=0.45)


def test_plan_uses_window_group_limit(spark):
    """The rank filter must compile to WindowGroupLimit (per-map partial
    top-k before the exchange) — the property that bounds the shuffle to
    O(parts·k) per group at corpus scale."""
    df = _fixture(spark, 1000)
    s = priority_sample(df, 5, "wt", group_col="source")
    plan = s._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "WindowGroupLimit" in plan


def test_k_validation(spark):
    df = _fixture(spark, 10)
    with pytest.raises(ValueError):
        priority_sample(df, 0, "wt")
