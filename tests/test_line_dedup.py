"""Corpus-level exact line dedup (RefinedWeb/FineWeb stage)."""

import pandas as pd
import pytest

from bloomine_spark.operators.dedup import line_dedup


def _docs(spark):
    rows = [
        {"doc_id": 1, "text": "unique one\nSHARED FOOTER\n\nbody a"},
        {"doc_id": 2, "text": "unique two\nSHARED FOOTER\nbody b"},
        {"doc_id": 3, "text": "SHARED FOOTER\nunique three"},
        {"doc_id": 4, "text": ""},
    ]
    return spark.createDataFrame(pd.DataFrame(rows))


def test_line_dedup_keep_first(spark):
    out = {r["doc_id"]: r for r in line_dedup(_docs(spark)).collect()}
    # doc 1 holds the canonical (min (id, pos)) occurrence — kept
    assert out[1]["text"] == "unique one\nSHARED FOOTER\n\nbody a"
    assert out[1]["n_lines_removed"] == 0
    assert out[2]["text"] == "unique two\nbody b"
    assert out[2]["n_lines_removed"] == 1
    assert out[3]["text"] == "unique three"
    assert out[4]["text"] == "" and out[4]["n_lines_removed"] == 0


def test_line_dedup_keep_none(spark):
    out = {
        r["doc_id"]: r for r in line_dedup(_docs(spark), keep="none").collect()
    }
    # every copy of the repeated line goes, including the first
    assert out[1]["text"] == "unique one\n\nbody a"
    assert out[2]["text"] == "unique two\nbody b"
    assert out[3]["text"] == "unique three"


def test_line_dedup_empty_lines_structural(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 1, "text": "a\n\nb"},
                {"doc_id": 2, "text": "c\n\nd"},
            ]
        )
    )
    out = {r["doc_id"]: r["text"] for r in line_dedup(df).collect()}
    assert out[1] == "a\n\nb" and out[2] == "c\n\nd"


def test_line_dedup_all_lines_removed(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"doc_id": 1, "text": "same"},
                {"doc_id": 2, "text": "same"},
            ]
        )
    )
    out = {r["doc_id"]: r for r in line_dedup(df).collect()}
    assert out[1]["text"] == "same"
    assert out[2]["text"] == "" and out[2]["n_lines_removed"] == 1


def test_line_dedup_bad_policy(spark):
    with pytest.raises(ValueError, match="keep"):
        line_dedup(_docs(spark), keep="oops")


def test_run_curate_cli_line_dedup(spark, tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    good = ("the quick brown fox jumps over a lazy dog and then the fox "
            "runs far away of the meadow and keeps going past the barn")
    rows = [
        {"doc_id": 1, "text": good + "\nsubscribe to our newsletter today",
         "lang": "en", "source": "s0"},
        {"doc_id": 2,
         "text": good.replace("fox", "hare")
         + "\nsubscribe to our newsletter today",
         "lang": "en", "source": "s0"},
    ]
    inp = str(tmp_path / "docs")
    spark.createDataFrame(pd.DataFrame(rows)).write.parquet(inp)
    out = str(tmp_path / "cur")
    argv = [
        sys.executable, os.path.join(repo, "jobs", "run_curate.py"),
        "--input", inp, "--output", out, "--run-id", "l0",
        "--quality-min", "0.2", "--top2-max", "0.4", "--min-tokens", "5",
        "--line-dedup",
    ]
    env = dict(os.environ, PYTHONPATH=repo)
    r = subprocess.run(argv, capture_output=True, text=True, env=env,
                       timeout=600)
    assert r.returncode == 0, r.stderr[-3000:]
    cur = spark.read.parquet(f"{out}/l0/curated").toPandas()
    t = dict(zip(cur["doc_id"], cur["text"]))
    assert "newsletter" in t[1]          # first occurrence protected
    assert "newsletter" not in t[2]      # repeat removed corpus-wide
    assert t[2].startswith("the quick brown hare")


def test_line_dedup_plan_narrow(spark):
    """The digest window never carries line text: the Exchange feeding
    the occurrence window projects only (id, pos, digest)."""
    plan = (
        line_dedup(_docs(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    ).split("== Initial Plan ==")[0]
    assert "CartesianProduct" not in plan
    assert "digest" in plan


def test_line_df_boilerplate_per_group(spark):
    from bloomine_spark.operators.dedup import line_df_boilerplate

    rows = [
        # host A: 4 docs, footer on all (df 4/4 > 1/2 -> dropped
        # EVERYWHERE, no survivor), promo on 1 (1/4 <= 1/2 -> kept)
        {"doc_id": 1, "host": "a", "text": "footer A\nbody one\npromo"},
        {"doc_id": 2, "host": "a", "text": "body two\nfooter A"},
        {"doc_id": 3, "host": "a", "text": "footer A\nfooter A\nbody three"},
        {"doc_id": 4, "host": "a", "text": "footer A"},
        # host B: 'footer A' appears in 1/2 of B's docs (not > 1/2) —
        # per-group scoping keeps it here even though host A drops it
        {"doc_id": 5, "host": "b", "text": "footer A\nbody five"},
        {"doc_id": 6, "host": "b", "text": "body six"},
    ]
    out = {
        r["doc_id"]: r
        for r in line_df_boilerplate(
            spark.createDataFrame(pd.DataFrame(rows)),
            group_col="host",
            max_doc_frac=0.5,
        ).collect()
    }
    assert out[1]["text"] == "body one\npromo"
    # in-doc repeats count the doc ONCE for df, but every copy drops
    assert out[3]["text"] == "body three"
    assert out[3]["n_lines_removed"] == 2
    assert out[4]["text"] == "" and out[4]["n_lines_removed"] == 1
    assert out[5]["text"] == "footer A\nbody five"  # group scoping
    assert out[5]["n_lines_removed"] == 0
    assert {r for r in (out[d]["host"] for d in out)} == {"a", "b"}


def test_line_df_boilerplate_min_doc_freq_global(spark):
    from bloomine_spark.operators.dedup import line_df_boilerplate

    rows = [
        {"doc_id": 1, "text": "nav\nalpha"},
        {"doc_id": 2, "text": "nav\nbeta"},
        {"doc_id": 3, "text": "nav\ngamma"},
        {"doc_id": 4, "text": "delta\n\nepsilon"},
    ]
    out = {
        r["doc_id"]: r
        for r in line_df_boilerplate(
            spark.createDataFrame(pd.DataFrame(rows)), min_doc_freq=3
        ).collect()
    }
    assert out[1]["text"] == "alpha"
    assert out[2]["text"] == "beta"
    # empty lines are structural: never counted, never removed
    assert out[4]["text"] == "delta\n\nepsilon"
    assert out[4]["n_lines_removed"] == 0


def test_line_df_boilerplate_validates(spark):
    from bloomine_spark.operators.dedup import line_df_boilerplate

    with pytest.raises(ValueError, match="min_doc_freq"):
        line_df_boilerplate(_docs(spark))
