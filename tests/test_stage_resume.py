"""Stage-level resume for the screen cascade: a died run must skip its
completed stages on rerun (the reference's output-existence stage skip,
BloomineRunner.py:170-190)."""

import numpy as np
import pandas as pd
import pytest

from bloomine_spark.params import ScreenParams
from bloomine_spark.sources.stages import resumable_cascade, stage_complete

HEAD = [11, 22, 33, 44, 55, 66, 77, 88, 99, 110, 121, 132]
TAIL = [201, 202, 203, 204, 205, 206, 207, 208, 209, 210, 211, 212]


@pytest.fixture(scope="module")
def seqs(spark):
    rows = []
    variants = [[1, 2, 3]] * 3 + [[4, 5, 6, 7]] * 2 + [[8, 9]]
    for i, v in enumerate(variants):
        read = [301, 302, 303] + HEAD + v + TAIL + [401, 402]
        rows.append(
            {
                "doc_id": f"r{i}",
                "tokens": np.array(read, dtype=np.int32),
                "source": "s0",
            }
        )
    rows.append(
        {
            "doc_id": "r_headonly",
            "tokens": np.array([0] * 4 + HEAD + [5] * 4, dtype=np.int32),
            "source": "s0",
        }
    )
    pdf = pd.DataFrame(rows)
    pdf["n_tok"] = pdf["tokens"].apply(len).astype("int32")
    return spark.createDataFrame(pdf[["doc_id", "tokens", "n_tok", "source"]])


def test_resume_skips_completed_stages(spark, seqs, tmp_path):
    run_dir = str(tmp_path / "run1")

    # first attempt dies before flank-2 (after flank-1 is committed)
    with pytest.raises(RuntimeError, match="injected failure"):
        resumable_cascade(
            seqs, HEAD, TAIL, run_dir, ScreenParams(),
            _fail_before="flank2_scores",
        )
    assert stage_complete(f"{run_dir}/flank1_scores")
    assert not stage_complete(f"{run_dir}/flank2_scores")

    # rerun: flank-1 must be SKIPPED, the rest runs to completion
    out, runner = resumable_cascade(
        seqs, HEAD, TAIL, run_dir, ScreenParams(), extract_min_kmer=11
    )
    assert runner.skipped == ["flank1_scores"]
    assert runner.ran == ["flank2_scores", "hits", "variants", "length_variants"]

    ids = {r["doc_id"] for r in out["hits"].select("doc_id").collect()}
    assert ids == {"r0", "r1", "r2", "r3", "r4", "r5"}
    vc = {tuple(r["extracted"]): r["count"] for r in out["variants"].collect()}
    assert vc == {(1, 2, 3): 3, (4, 5, 6, 7): 2, (8, 9): 1}

    # third run: everything is complete -> nothing recomputes
    out3, runner3 = resumable_cascade(
        seqs, HEAD, TAIL, run_dir, ScreenParams(), extract_min_kmer=11
    )
    assert runner3.ran == []
    assert set(runner3.skipped) == {
        "flank1_scores", "flank2_scores", "hits", "variants", "length_variants"
    }
    assert out3["hits"].count() == 6

    # resumed results identical to a fresh un-failed run
    fresh, _ = resumable_cascade(
        seqs, HEAD, TAIL, str(tmp_path / "fresh"), ScreenParams(),
        extract_min_kmer=11,
    )
    a = out["variants"].toPandas().sort_values("count").reset_index(drop=True)
    b = fresh["variants"].toPandas().sort_values("count").reset_index(drop=True)
    assert [list(x) for x in a["extracted"]] == [list(x) for x in b["extracted"]]


def test_force_reruns_everything(spark, seqs, tmp_path):
    run_dir = str(tmp_path / "run2")
    resumable_cascade(seqs, HEAD, TAIL, run_dir, ScreenParams())
    _, runner = resumable_cascade(
        seqs, HEAD, TAIL, run_dir, ScreenParams(), force=True
    )
    assert runner.skipped == []
    assert runner.ran == ["flank1_scores", "flank2_scores", "hits"]


def test_changed_inputs_invalidate_stale_stages(spark, seqs, tmp_path):
    """A completed stage is only reusable if built from the SAME inputs:
    rerunning with a different flank2 must rebuild flank2-dependent stages
    (previously they were silently reused stale) while flank1 still skips."""
    run_dir = str(tmp_path / "run3")
    resumable_cascade(seqs, HEAD, TAIL, run_dir, ScreenParams())

    other_tail = list(range(901, 913))  # absent from every read
    out, runner = resumable_cascade(
        seqs, HEAD, other_tail, run_dir, ScreenParams()
    )
    assert runner.skipped == ["flank1_scores"]
    assert runner.ran == ["flank2_scores", "hits"]
    # the rebuilt flank-2 screen reflects the NEW flank: nothing passes it
    assert out["hits"].count() == 0

    # params changes invalidate the first screen too
    _, runner2 = resumable_cascade(
        seqs, HEAD, other_tail, run_dir, ScreenParams(fp_sim=35.0)
    )
    assert runner2.ran[0] == "flank1_scores"
