"""Stage-level resume for the screen/cascade pipeline.

The reference runner skips whole pipeline stages whose output files already
exist (/root/reference/bloomine/BloomineRunner.py:170-190: each stage
checks its outfile before running). The distributed analog: every stage
materializes to ``<run_dir>/<stage>/`` parquet, and a completed stage is
recognized by Spark's ``_SUCCESS`` marker — a rerun of a died 100 TB screen
reads completed stages back instead of recomputing them. (Per-PARTITION
resume inside one aggregation stage lives in ``sources/checkpoint.py``;
this module is the coarser per-STAGE skip that matches the reference.)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloomine_spark.params import ScreenParams


def stage_complete(path: str) -> bool:
    """A stage output is complete iff Spark committed it (_SUCCESS)."""
    return os.path.isfile(os.path.join(path, "_SUCCESS"))


@dataclass
class StageRunner:
    """Materialize-or-reload executor for named pipeline stages.

    ``ran`` / ``skipped`` record what actually executed — the test hook and
    the operational log (the reference prints "skipping <stage>" the same
    way)."""

    spark: SparkSession
    run_dir: str
    force: bool = False
    ran: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        path = os.path.join(self.run_dir, name)
        if not self.force and stage_complete(path):
            self.skipped.append(name)
            return self.spark.read.parquet(path)
        df = build()
        df.write.mode("overwrite").parquet(path)
        self.ran.append(name)
        # read back: downstream stages consume the materialized artifact,
        # so a later failure never recomputes this stage's lineage
        return self.spark.read.parquet(path)


def resumable_cascade(
    df: DataFrame,
    flank1: Sequence[int],
    flank2: Sequence[int],
    run_dir: str,
    params: ScreenParams = ScreenParams(),
    extract_min_kmer: int | None = None,
    force: bool = False,
    _fail_before: str | None = None,
) -> tuple[dict[str, DataFrame], StageRunner]:
    """Two-flank cascade with per-stage persist + skip-on-rerun.

    Stages (the reference's flank-1 → flank-2 → MOI file chain):
      flank1_scores — full score log of the first screen (tokens kept)
      flank2_scores — second screen over flank-1 survivors only
      hits          — rows passing both flanks
      variants      — MOI variant counts (only when extract_min_kmer set)

    Returns ({stage: DataFrame}, runner) — ``runner.ran``/``runner.skipped``
    say what executed. ``_fail_before`` injects a crash before the named
    stage builds (resume-path test hook, like checkpoint.py's
    fail_partitions).
    """
    from bloomine_spark.operators.cascade import (
        extract_targets,
        length_variant_counts,
        variant_counts,
    )
    from bloomine_spark.operators.screen import screen_scores

    runner = StageRunner(df.sparkSession, run_dir, force=force)
    out: dict[str, DataFrame] = {}

    def _check_fail(stage: str) -> None:
        if _fail_before == stage and not stage_complete(
            os.path.join(run_dir, stage)
        ):
            raise RuntimeError(f"injected failure before stage {stage}")

    _check_fail("flank1_scores")
    s1 = runner.stage(
        "flank1_scores", lambda: screen_scores(df, flank1, params, keep_tokens=True)
    )
    out["flank1_scores"] = s1

    _check_fail("flank2_scores")
    seq_cols = list(df.columns)
    s2 = runner.stage(
        "flank2_scores",
        lambda: screen_scores(
            s1.filter(F.col("sp_pass")).select(*seq_cols),
            flank2,
            params,
            keep_tokens=True,
        ),
    )
    out["flank2_scores"] = s2

    _check_fail("hits")
    hits = runner.stage("hits", lambda: s2.filter(F.col("sp_pass")))
    out["hits"] = hits

    if extract_min_kmer is not None:
        _check_fail("variants")
        extracted = extract_targets(hits, flank1, flank2, min_kmer=extract_min_kmer)
        out["variants"] = runner.stage(
            "variants", lambda: variant_counts(extracted)
        )
        out["length_variants"] = runner.stage(
            "length_variants", lambda: length_variant_counts(extracted)
        )
    return out, runner
