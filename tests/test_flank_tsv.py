"""Combined flank-scores TSV sink: byte-format parity with the reference's
``<prefix>_combined_flank_scores.tsv``
(/root/reference/bloomine/BloomineRunner.py:205-274) — exact header, rows
sorted by read_id, EMPTY fields for missing scores, integer score cells,
``str(float)`` threshold, 0/1 pass — plus the jobs/run_screen.py --tsv
wiring driven as a real subprocess."""

import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from bloomine_spark.operators.cascade import combined_flank_scores
from bloomine_spark.operators.report import render_flank_scores_tsv

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flank_scores_tsv_golden(spark):
    s1 = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "a", "a", "b"],
                "rc": [False, True, False, False],
                "score": [10, 8, 4, 7],  # a fwd keeps max(10, 4)
            }
        )
    )
    s2 = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": ["a", "c"],
                "rc": [False, True],
                "score": [9, 12],
            }
        )
    )
    got = render_flank_scores_tsv(combined_flank_scores(s1, s2, 9.0, 9.0))
    want = (
        "read_id\tflank_1_score\tflank_1_RC_score\tflank_2_score\t"
        "flank_2_RC_score\tthreshold\tpass\n"
        # a: f1 best 10 >= 9 and f2 best 9 >= 9 -> pass 1
        "a\t10\t8\t9\t\t9.0\t1\n"
        # b: no flank-2 scores at all -> empty f2 fields, pass 0
        "b\t7\t\t\t\t9.0\t0\n"
        # c: flank-2 RC only, no flank-1 -> pass 0
        "c\t\t\t\t12\t9.0\t0\n"
    )
    assert got == want


def test_run_screen_tsv_subprocess(spark, tmp_path):
    HEAD = [11, 22, 33, 44, 55, 66, 77, 88, 99, 110, 121, 132]
    TAIL = [201, 202, 203, 204, 205, 206, 207, 208, 209, 210, 211, 212]
    rows = []
    for i in range(4):
        read = [301, 302] + HEAD + [1, 2, 3] + TAIL + [401]
        rows.append(
            {"doc_id": f"r{i}", "tokens": np.array(read, np.int32),
             "source": "s0"}
        )
    # one read with only the head flank: appears with empty f2 fields
    rows.append(
        {"doc_id": "r_headonly",
         "tokens": np.array([0, 0] + HEAD + [5] * 6, np.int32),
         "source": "s0"}
    )
    pdf = pd.DataFrame(rows)
    pdf["n_tok"] = pdf["tokens"].apply(len).astype("int32")
    inp = str(tmp_path / "seqs")
    spark.createDataFrame(
        pdf[["doc_id", "tokens", "n_tok", "source"]]
    ).write.parquet(inp)

    tsv = str(tmp_path / "combined_flank_scores.tsv")
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "jobs", "run_screen.py"),
            "--input", inp,
            "--target", ",".join(map(str, HEAD)),
            "--flank2", ",".join(map(str, TAIL)),
            "--k", "7", "--fp-sim", "50",
            "--output", str(tmp_path / "out"), "--run-id", "tsvtest",
            "--tsv", tsv,
        ],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = open(tsv).read().splitlines()
    assert lines[0] == (
        "read_id\tflank_1_score\tflank_1_RC_score\tflank_2_score\t"
        "flank_2_RC_score\tthreshold\tpass"
    )
    body = {ln.split("\t")[0]: ln.split("\t") for ln in lines[1:]}
    assert len(body) == 5 and all(len(v) == 7 for v in body.values())
    # full reads pass; the head-only read has empty f2 cells and pass 0
    assert body["r0"][6] == "1"
    ho = body["r_headonly"]
    assert ho[3] == "" and ho[4] == "" and ho[6] == "0"
