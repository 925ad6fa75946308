"""Iceberg table adapter.

At production scale (the north rule's 10^12-sequence corpus) the sequences
table is Apache Iceberg: ``spark.table("catalog.db.sequences")`` with
partition pruning on `source`, hidden-partition transforms, and snapshot
isolation for the resumable checkpoint reads. This container ships no
Iceberg runtime jars, so the adapter resolves in order:

 1. an Iceberg/catalog table if the session has a configured catalog,
 2. a parquet directory path (the test/bench path).

Everything downstream is source-agnostic: operators take DataFrames.

Cluster session configs this engine expects for Iceberg (documented here,
applied via spark-submit --conf; tests/test_iceberg_live.py runs the live
path automatically whenever the runtime jar is on the classpath — this
container ships without it, so the test self-skips):

  # runtime (match the Spark/Scala build):
  --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<version>
  # production catalog:
  spark.sql.extensions=org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions
  spark.sql.catalog.lake=org.apache.iceberg.spark.SparkCatalog
  spark.sql.catalog.lake.type=glue|hive|rest
  # local/dev Hadoop catalog (what the live test uses):
  spark.sql.catalog.lake.type=hadoop
  spark.sql.catalog.lake.warehouse=file:///path/to/warehouse

Reads then address ``lake.db.sequences``; `load_sequences` passes the
identifier straight to ``spark.table`` so partition pruning on `source`,
hidden-partition transforms, and snapshot-isolated reads (`VERSION AS OF`
for resumable checkpoints) all come from the catalog, not this adapter.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def load_sequences(spark: SparkSession, source: str) -> DataFrame:
    """Load the sequences table from an Iceberg identifier or parquet path."""
    if os.path.isdir(source) or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.table(source)


def write_sequences(df: DataFrame, target: str, mode: str = "append") -> None:
    """Write to an Iceberg identifier (writeTo) or parquet path (fallback)."""
    if "/" in target or target.endswith(".parquet"):
        df.write.mode(mode).parquet(target)
    elif mode == "append":
        df.writeTo(target).append()
    else:
        df.writeTo(target).createOrReplace()
