"""spark-submit entry points driven end-to-end as real subprocesses:
run_moi.py (cascade → extraction → subpop report, stage-resumable) and
run_polyfamily.py (one-pass multi-probe → assignments + JSON summary)."""

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD = [11, 22, 33, 44, 55, 66, 77, 88, 99, 110, 121, 132]
TAIL = [201, 202, 203, 204, 205, 206, 207, 208, 209, 210, 211, 212]
HEAD_B = [501, 502, 503, 504, 505, 506, 507, 508, 509, 510, 511, 512]


def _write_input(spark, tmp_path):
    rows = []
    variants = [[1, 2, 3]] * 3 + [[4, 5, 6, 7]] * 2
    for i, v in enumerate(variants):
        read = [301, 302] + HEAD + v + TAIL + [401]
        rows.append({"doc_id": f"a{i}", "tokens": np.array(read, np.int32),
                     "source": "s0"})
    for i in range(2):  # probe-B docs
        read = [301] + HEAD_B + [8, 9] + TAIL + [402, 403]
        rows.append({"doc_id": f"b{i}", "tokens": np.array(read, np.int32),
                     "source": "s0"})
    pdf = pd.DataFrame(rows)
    pdf["n_tok"] = pdf["tokens"].apply(len).astype("int32")
    path = str(tmp_path / "seqs")
    spark.createDataFrame(pdf[["doc_id", "tokens", "n_tok", "source"]]).write.parquet(path)
    return path


def _run(job, argv):
    env = dict(os.environ, PYTHONPATH=REPO)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", job), *argv],
        capture_output=True, text=True, env=env, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    return r.stdout


def test_run_moi_cli_writes_report_and_resumes(spark, tmp_path):
    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "out")
    argv = ["--input", inp, "--head", ",".join(map(str, HEAD)),
            "--tail", ",".join(map(str, TAIL)), "--min-kmer", "11",
            "--output", out, "--run-id", "m0"]
    stdout = _run("run_moi.py", argv)
    assert "stages ran: ['flank1_scores'" in stdout
    report = open(f"{out}/m0/subpop_report.txt").read()
    assert "Sequence variants:" in report and "Length variants:" in report
    assert "1 2 3\t3" in report          # detokenized variant + count
    assert "4 5 6 7\t2" in report
    assert "3\t3" in report and "4\t2" in report  # length section
    # rerun: every stage skipped
    stdout2 = _run("run_moi.py", argv)
    assert "stages ran: []" in stdout2


def test_run_polyfamily_cli_writes_json(spark, tmp_path):
    inp = _write_input(spark, tmp_path)
    out = str(tmp_path / "pf")
    targets = json.dumps({"probeA": [HEAD, TAIL], "probeB": [HEAD_B, TAIL]})
    _run("run_polyfamily.py", ["--input", inp, "--targets", targets,
                               "--min-kmer", "11", "--output", out])
    blob = json.load(open(f"{out}/polyfamily.json"))
    assert set(blob) == {"probeA", "probeB"}
    assert ["1 2 3", 3] in blob["probeA"]
    assert ["4 5 6 7", 2] in blob["probeA"]
    assert blob["probeB"] == [["8 9", 2]]
    assigned = spark.read.parquet(f"{out}/assignments").toPandas()
    got = dict(zip(assigned["doc_id"], assigned["target_id"]))
    assert got == {"a0": "probeA", "a1": "probeA", "a2": "probeA",
                   "a3": "probeA", "a4": "probeA", "b0": "probeB",
                   "b1": "probeB"}
