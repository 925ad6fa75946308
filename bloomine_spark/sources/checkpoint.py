"""Per-partition sketch checkpointing with lineage + metrics, and
resume-from-checkpoint — the distributed generalization of the reference's
output-existence stage skip (/root/reference/bloomine/BloomineRunner.py:170-190).

A checkpointed aggregation persists one row per input partition:
(partition_id, sketch_state, rows, n_values, secs, ts). Resuming lists the
completed partition ids, recomputes ONLY the missing ones, appends them,
and merges — so a 10k-partition job that died at 9k partitions redoes 1k,
not 10k. Partition ids are stable as long as the input files and
maxPartitionBytes are unchanged (documented invariant).
"""

from __future__ import annotations

import os
import time
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from bloomine_spark.sketch.core import _merge_states, _values_of

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("sketch_state", T.BinaryType()),
        T.StructField("rows", T.LongType()),
        T.StructField("n_values", T.LongType()),
        T.StructField("secs", T.DoubleType()),
    ]
)


def partials_with_lineage(
    df: DataFrame, value_col: str, factory: Callable[[], object]
) -> DataFrame:
    """One sketch state per partition + per-partition metrics."""

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.time()
        pid = TaskContext.get().partitionId()
        sk = factory()
        rows = 0
        n_values = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = _values_of(pdf[value_col])
            sk.update_values(vals)
            rows += len(pdf)
            n_values += len(vals)
        yield pd.DataFrame(
            {
                "partition_id": [pid],
                "sketch_state": [sk.to_bytes()],
                "rows": [rows],
                "n_values": [n_values],
                "secs": [round(time.time() - t0, 4)],
            }
        )

    return df.mapInPandas(fold, schema=LINEAGE_SCHEMA)


def checkpoint_dir(base: str, run_id: str, stage: str) -> str:
    return os.path.join(base, run_id, stage)


def checkpointed_sketch_agg(
    df: DataFrame,
    value_col: str,
    factory: Callable[[], object],
    base_dir: str,
    run_id: str,
    stage: str,
    fail_partitions: set[int] | None = None,
):
    """Global sketch aggregation with per-partition checkpoint + resume.

    Returns (sketch, lineage_df). On a rerun with the same (run_id, stage),
    partitions already checkpointed are skipped — only missing ones compute.
    ``fail_partitions`` injects failures after persisting earlier partitions
    (test hook for the resume path).
    """
    spark = df.sparkSession
    path = checkpoint_dir(base_dir, run_id, stage)

    done: set[int] = set()
    if os.path.isdir(path):
        try:
            existing = spark.read.parquet(path)
            done = {r["partition_id"] for r in existing.select("partition_id").collect()}
        except Exception:  # noqa: BLE001 - empty/corrupt dir → full recompute
            done = set()

    n_parts = df.rdd.getNumPartitions()
    missing = [p for p in range(n_parts) if p not in done]

    if missing:
        work = df
        if done:
            # recompute only missing partitions; partition ids are stable
            # for unchanged input files
            pids = spark.sparkContext.broadcast(set(missing))

            def keep(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from pyspark import TaskContext

                if TaskContext.get().partitionId() in pids.value:
                    yield from batches

            work = df.mapInPandas(keep, schema=df.schema)

        partials = partials_with_lineage(work, value_col, factory)
        if done:
            partials = partials.filter(
                F.col("partition_id").isin([int(p) for p in missing])
            )
        if fail_partitions:
            bad = spark.sparkContext.broadcast(set(fail_partitions))

            def poison(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
                from pyspark import TaskContext

                for pdf in batches:
                    if TaskContext.get().partitionId() in bad.value:
                        raise RuntimeError(
                            f"injected failure in partition "
                            f"{TaskContext.get().partitionId()}"
                        )
                    yield pdf

            partials = partials.mapInPandas(poison, schema=LINEAGE_SCHEMA)
        partials.write.mode("append").parquet(path)

    lineage = spark.read.parquet(path).dropDuplicates(["partition_id"])
    states = [r["sketch_state"] for r in lineage.select("sketch_state").collect()]
    blob = _merge_states([bytes(s) for s in states], factory)
    return type(factory()).from_bytes(blob), lineage
