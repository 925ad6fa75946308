"""Targets-table validation, low-complexity warning (F6), legacy flank
intersection (J2), and the multi-probe polyfamily pipeline end-to-end."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from bloomine_spark.operators.cascade import flank_intersection, polyfamily_run
from bloomine_spark.params import ScreenParams
from bloomine_spark.sources.targets import (
    MalformedTargetsError,
    low_complexity_targets,
    targets_df,
    validate_targets,
)

P = ScreenParams()

PROBE_A = ([11, 22, 33, 44, 55, 66, 77, 88, 99, 110, 121, 132],
           [201, 202, 203, 204, 205, 206, 207, 208, 209, 210, 211, 212])
PROBE_B = ([31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42],
           [61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72])


def test_targets_validation(spark):
    t = targets_df(spark, {"pA": PROBE_A, "pB": PROBE_B})
    got = validate_targets(t)
    assert set(got) == {"pA", "pB"}
    assert got["pA"][0] == PROBE_A[0]

    # malformed: missing flank 2 → error (BloomineRunner.py:153-154 analog)
    bad = t.filter(~((F.col("target_id") == "pA") & (F.col("flank") == 2)))
    with pytest.raises(MalformedTargetsError):
        validate_targets(bad)


def test_low_complexity_warning(spark):
    # period-4 12-token flank: 6 k-grams (k=7), 4 unique → 4*2 >= 6, NOT low
    # complexity; a constant flank: 6 k-grams, 1 unique → flagged
    t = targets_df(
        spark,
        {
            "periodic": ([1, 2, 3, 4] * 3, [9] * 12),
            "normal": (PROBE_A[0], PROBE_A[1]),
        },
    )
    flagged = low_complexity_targets(t, k=7).toPandas()
    assert set(zip(flagged["target_id"], flagged["flank"])) == {("periodic", 2)}
    assert flagged.iloc[0]["n_unique"] == 1


def _mk_corpus(spark):
    rows = []
    rng = np.random.default_rng(3)

    def bg(n):
        return rng.integers(300, 500, n).tolist()

    # docs matching probe A strongly, probe B weakly, and vice versa
    for i in range(6):
        rows.append((f"a{i}", bg(5) + PROBE_A[0] + [1, 2, 3] + PROBE_A[1] + bg(5)))
    for i in range(4):
        rows.append((f"b{i}", bg(5) + PROBE_B[0] + [7, 8] + PROBE_B[1] + bg(5)))
    # doc matching BOTH probes → argmax + lexicographic tiebreak decides
    rows.append(
        ("both0", PROBE_A[0] + PROBE_A[1] + bg(3) + PROBE_B[0] + PROBE_B[1])
    )
    rows.append(("bg0", bg(60)))
    pdf = pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "tokens": [np.array(r[1], dtype=np.int32) for r in rows],
        }
    )
    pdf["n_tok"] = pdf["tokens"].apply(len).astype("int32")
    pdf["source"] = "s0"
    return spark.createDataFrame(pdf[["doc_id", "tokens", "n_tok", "source"]])


def test_flank_intersection_inner_join(spark):
    s1 = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d1", "d1", "d2"], "score": [100, 120, 50]})
    )
    s2 = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d1", "d3"], "score": [90, 200]})
    )
    got = flank_intersection(s1, s2, 60.0, 60.0).toPandas()
    # d2 (only flank1), d3 (only flank2) drop via inner join; d1 passes
    assert list(got["doc_id"]) == ["d1"]
    assert got.iloc[0]["total"] == 210
    # threshold failure drops the row
    assert flank_intersection(s1, s2, 60.0, 95.0).count() == 0


def test_polyfamily_end_to_end(spark):
    corpus = _mk_corpus(spark)
    got = polyfamily_run(
        corpus, {"pA": PROBE_A, "pB": PROBE_B}, P
    ).toPandas().set_index("doc_id")
    for i in range(6):
        assert got.loc[f"a{i}", "target_id"] == "pA"
    for i in range(4):
        assert got.loc[f"b{i}", "target_id"] == "pB"
    # 'both0' matches both probes perfectly (equal total) → tie-break to
    # lexicographically smaller probe id (polyfamily.py:159)
    assert got.loc["both0", "target_id"] == "pA"
    assert "bg0" not in got.index
