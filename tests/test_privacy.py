"""k-anonymity audit + local-recoding generalization ladder."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.privacy import (
    generalize_to_k,
    k_anonymity_audit,
)


def _people(spark):
    rows = [
        # class (z1, a) : 3 members, 1 distinct diag  -> l-violation only
        {"pid": 1, "zip": "z1", "age": "a", "diag": "flu"},
        {"pid": 2, "zip": "z1", "age": "a", "diag": "flu"},
        {"pid": 3, "zip": "z1", "age": "a", "diag": "flu"},
        # class (z1, b) : 2 members -> k-violation (k=3)
        {"pid": 4, "zip": "z1", "age": "b", "diag": "flu"},
        {"pid": 5, "zip": "z1", "age": "b", "diag": "cold"},
        # class (z2, a) : 3 members, 2 diags -> clean at k=3, l=2
        {"pid": 6, "zip": "z2", "age": "a", "diag": "flu"},
        {"pid": 7, "zip": "z2", "age": "a", "diag": "cold"},
        {"pid": 8, "zip": "z2", "age": "a", "diag": "cold"},
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_audit_k_and_l(spark):
    out = {
        (r["zip"], r["age"]): r
        for r in k_anonymity_audit(
            _people(spark), ["zip", "age"], k=3,
            sensitive_col="diag", l=2,
        ).collect()
    }
    assert out[("z1", "a")]["class_size"] == 3
    assert not out[("z1", "a")]["k_violation"]
    assert out[("z1", "a")]["n_sensitive"] == 1
    assert out[("z1", "a")]["l_violation"]  # k holds but diag leaks
    assert out[("z1", "b")]["k_violation"]
    assert not out[("z2", "a")]["k_violation"]
    assert not out[("z2", "a")]["l_violation"]


def test_audit_validation(spark):
    with pytest.raises(ValueError, match="together"):
        k_anonymity_audit(_people(spark), ["zip"], k=2, sensitive_col="diag")
    with pytest.raises(ValueError, match="k must"):
        k_anonymity_audit(_people(spark), ["zip"], k=0)


def _ladder():
    return [
        {"zip": F.col("zip"), "age": F.col("age")},
        {"zip": F.col("zip"), "age": F.lit(None).cast("string")},
    ]


def test_generalize_remainder_competition(spark):
    # (z1, a) reaches k=3 at level 0 and publishes there; the remaining
    # z1 rows (4, 5) then compete at level 1 WITHOUT the published ones:
    # zip-only class {4, 5} has size 2 < 3 -> suppressed, which is the
    # local-recoding semantics (global recoding would have kept them:
    # all five z1 rows share the zip)
    out = {
        r["pid"]: r
        for r in generalize_to_k(
            _people(spark), "pid", _ladder(), k=3
        ).collect()
    }
    assert all(out[p]["gen_level"] == 0 for p in (1, 2, 3))
    assert all(out[p]["gen_level"] == 0 for p in (6, 7, 8))
    assert all(out[p]["gen_level"] == -1 for p in (4, 5))
    assert out[4]["zip"] is None and out[4]["age"] is None
    # published quasi values survive as strings
    assert out[1]["zip"] == "z1" and out[1]["age"] == "a"


def test_generalize_coarse_level_absorbs(spark):
    # k=4: no level-0 class reaches 4, but zip-only classes do (z1: 5)
    out = {
        r["pid"]: r
        for r in generalize_to_k(
            _people(spark), "pid", _ladder(), k=4
        ).collect()
    }
    assert all(out[p]["gen_level"] == 1 for p in (1, 2, 3, 4, 5))
    assert out[1]["age"] is None and out[1]["zip"] == "z1"
    assert all(out[p]["gen_level"] == -1 for p in (6, 7, 8))  # z2: 3 < 4


def test_generalize_published_classes_reach_k(spark):
    # invariant: every published (gen_level, *quasi) class has >= k rows
    for k in (2, 3, 4):
        out = generalize_to_k(_people(spark), "pid", _ladder(), k=k)
        sizes = (
            out.filter(F.col("gen_level") >= 0)
            .groupBy("gen_level", "zip", "age")
            .count()
            .collect()
        )
        assert all(r["count"] >= k for r in sizes)
        assert out.count() == 8  # every row accounted for


def test_generalize_validation(spark):
    with pytest.raises(ValueError, match="non-empty"):
        generalize_to_k(_people(spark), "pid", [], k=2)
    with pytest.raises(ValueError, match="same output"):
        generalize_to_k(
            _people(spark), "pid",
            [{"zip": F.col("zip")}, {"age": F.col("age")}], k=2,
        )
