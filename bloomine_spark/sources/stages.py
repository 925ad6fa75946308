"""Stage-level resume for the screen/cascade pipeline.

The reference runner skips whole pipeline stages whose output files already
exist (/root/reference/bloomine/BloomineRunner.py:170-190: each stage
checks its outfile before running). The distributed analog: every stage
materializes to ``<run_dir>/<stage>/`` parquet, and a completed stage is
recognized by Spark's ``_SUCCESS`` marker — a rerun of a died 100 TB screen
reads completed stages back instead of recomputing them.

Two production-hardening properties beyond the reference:

- Completion checks go through the **Hadoop FileSystem API**, not
  ``os.path`` — the run_dir can be ``hdfs://`` / ``s3a://`` / ``file://``
  and the skip logic behaves identically (an os.path check silently
  recomputes everything on object stores).
- Each stage records a small ``_PARAMS.json`` **manifest** (underscore
  prefix → invisible to Spark's parquet reader) of the inputs that defined
  it; a rerun with different flanks/params rebuilds instead of silently
  returning stale results.

(Per-PARTITION resume inside one aggregation stage lives in
``sources/checkpoint.py``; this module is the coarser per-STAGE skip that
matches the reference.)
"""

from __future__ import annotations

import json
import os
import posixpath
from dataclasses import dataclass, field
from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bloomine_spark.params import ScreenParams

MANIFEST_NAME = "_PARAMS.json"


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, p, jvm


def stage_complete(path: str, spark: SparkSession | None = None) -> bool:
    """A stage output is complete iff Spark committed it (_SUCCESS).

    With a session, the check uses the Hadoop FileSystem for ``path``'s
    scheme (HDFS/S3/local alike); without one it falls back to the local
    filesystem (numpy-only tests).
    """
    marker = posixpath.join(path, "_SUCCESS")
    if spark is None:
        return os.path.isfile(marker)
    fs, p, _ = _hadoop_path(spark, marker)
    return bool(fs.exists(p))


def write_manifest(spark: SparkSession, stage_path: str, manifest: dict) -> None:
    """Write the stage's input manifest next to its parquet (any scheme)."""
    fs, p, _ = _hadoop_path(spark, posixpath.join(stage_path, MANIFEST_NAME))
    out = fs.create(p, True)
    try:
        out.write(json.dumps(manifest, sort_keys=True).encode())
    finally:
        out.close()


def read_manifest(spark: SparkSession, stage_path: str) -> dict | None:
    fs, p, jvm = _hadoop_path(spark, posixpath.join(stage_path, MANIFEST_NAME))
    if not fs.exists(p):
        return None
    stream = fs.open(p)
    try:
        txt = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(txt)


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

    def stage(
        self,
        name: str,
        build: Callable[[], DataFrame],
        manifest: dict | None = None,
    ) -> DataFrame:
        path = posixpath.join(self.run_dir, name)
        if (
            not self.force
            and stage_complete(path, self.spark)
            and self._manifest_matches(path, manifest)
        ):
            self.skipped.append(name)
            return self.spark.read.parquet(path)
        df = build()
        df.write.mode("overwrite").parquet(path)
        if manifest is not None:
            write_manifest(self.spark, path, manifest)
        self.ran.append(name)
        # read back: downstream stages consume the materialized artifact,
        # so a later failure never recomputes this stage's lineage
        return self.spark.read.parquet(path)

    def _manifest_matches(self, path: str, manifest: dict | None) -> bool:
        """A completed stage is reusable only if it was built from the same
        inputs. No expected manifest → legacy behavior (marker suffices);
        expected but absent/different on disk → rebuild."""
        if manifest is None:
            return True
        stored = read_manifest(self.spark, path)
        return stored == json.loads(json.dumps(manifest, sort_keys=True))


def resumable_cascade(
    df: DataFrame,
    flank1: Sequence[int],
    flank2: Sequence[int],
    run_dir: str,
    params: ScreenParams = ScreenParams(),
    extract_min_kmer: int | None = None,
    force: bool = False,
    complement_map=None,
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
    from dataclasses import asdict

    from bloomine_spark.operators.cascade import (
        extract_targets,
        length_variant_counts,
        variant_counts,
    )
    from bloomine_spark.operators.screen import screen_scores

    runner = StageRunner(df.sparkSession, run_dir, force=force)
    out: dict[str, DataFrame] = {}
    spark = df.sparkSession

    # each stage's manifest holds ONLY the inputs that define it — adding
    # extract_min_kmer on a resumed run must not invalidate the screens
    f1_manifest = {"flank1": [int(t) for t in flank1], "params": asdict(params)}
    if complement_map is not None:
        # a different RC vocabulary means different screen/extract results:
        # it must invalidate resumed stages
        f1_manifest["complement_map"] = [int(t) for t in complement_map]
    f2_manifest = dict(f1_manifest, flank2=[int(t) for t in flank2])
    var_manifest = dict(f2_manifest, extract_min_kmer=extract_min_kmer)

    def _check_fail(stage: str) -> None:
        if _fail_before == stage and not stage_complete(
            posixpath.join(run_dir, stage), spark
        ):
            raise RuntimeError(f"injected failure before stage {stage}")

    _check_fail("flank1_scores")
    s1 = runner.stage(
        "flank1_scores",
        lambda: screen_scores(df, flank1, params, keep_tokens=True,
                              complement_map=complement_map),
        manifest=dict(f1_manifest, stage="flank1_scores"),
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
            complement_map=complement_map,
        ),
        manifest=dict(f2_manifest, stage="flank2_scores"),
    )
    out["flank2_scores"] = s2

    _check_fail("hits")
    hits = runner.stage(
        "hits",
        lambda: s2.filter(F.col("sp_pass")),
        manifest=dict(f2_manifest, stage="hits"),
    )
    out["hits"] = hits

    if extract_min_kmer is not None:
        _check_fail("variants")
        extracted = extract_targets(hits, flank1, flank2,
                                    min_kmer=extract_min_kmer,
                                    complement_map=complement_map)
        out["variants"] = runner.stage(
            "variants",
            lambda: variant_counts(extracted),
            manifest=dict(var_manifest, stage="variants"),
        )
        out["length_variants"] = runner.stage(
            "length_variants",
            lambda: length_variant_counts(extracted),
            manifest=dict(var_manifest, stage="length_variants"),
        )
    return out, runner
